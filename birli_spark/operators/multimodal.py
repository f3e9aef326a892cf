"""Multimodal-column plumbing (north-star requirement): treat image /
audio / video payloads as opaque ``binary`` columns with typed metadata,
with decode / feature-extract / frame-sample stages as Arrow-batched
pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries; :func:`decode_image` is a
REAL pure-numpy decoder for the self-describing uncompressed formats
(P5/P6 netpbm, 24/32-bit uncompressed BMP — round-trip tested and the
mm9 pixel-stats operator is oracle-gated over genuinely decoded
pixels), and only the compressed formats (PNG/JPEG) remain gated on
PIL with an honest NotImplementedError. Everything Spark-side — binary
schema, metadata columns, UDF signatures, Arrow batch shapes — is real
and oracle-checked.

Scale: media payloads dominate row size, so the operators never shuffle
the binary column — features are extracted in a narrow ``mapInPandas``
pass directly over the scan, and only the (tiny) feature rows move
downstream. Frame sampling is a controlled explode: n_frames rows per
asset, all integer arithmetic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal asset table from ``documents``: payload =
    utf-8 bytes of the text (a deterministic stand-in for an image blob),
    plus typed metadata (mime, declared width/height/frame count)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
        F.expr("CAST(16 + doc_id % 64 AS INT)").alias("width"),
        F.expr("CAST(16 + (doc_id * 7) % 64 AS INT)").alias("height"),
        F.expr("CAST(1 + doc_id % 8 AS INT)").alias("n_frames"))


def _decode_pnm(payload: bytes):
    """P5 (PGM, grayscale) / P6 (PPM, RGB) binary netpbm decode — pure
    numpy, full comment/whitespace header handling."""
    import numpy as np
    magic = payload[:2]
    depth = 1 if magic == b"P5" else 3
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    data = np.frombuffer(payload, np.uint8, count=w * h * depth,
                         offset=pos)
    arr = data.reshape(h, w, depth)
    return arr[:, :, 0] if depth == 1 else arr


def _decode_bmp(payload: bytes):
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP decode — pure numpy:
    little-endian header fields, 4-byte row padding, bottom-up (or
    top-down via negative height) raster, BGR order."""
    import struct

    import numpy as np
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp},"
            f" compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * (bpp // 8) + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)
    px = rows[:, :w * (bpp // 8)].reshape(h, w, bpp // 8)
    if bottom_up:
        px = px[::-1]
    return px[:, :, 2::-1]  # BGR(A) -> RGB


def decode_image(payload: bytes):
    """Real pure-numpy decode for the self-describing uncompressed
    formats — P5/P6 netpbm and 24/32-bit uncompressed BMP — returning a
    (h, w) grayscale or (h, w, 3) RGB uint8 array. Compressed formats
    (PNG/JPEG/...) fall through to PIL when importable and otherwise
    raise ``NotImplementedError`` with the environment boundary (this
    container ships no image libraries)."""
    payload = bytes(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if _HAVE_PIL:  # pragma: no cover - PIL absent here
        import io

        import numpy as np
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(payload)))
    raise NotImplementedError(
        "compressed image decode (PNG/JPEG/...) requires PIL, which is "
        "not available in this environment; netpbm (P5/P6) and "
        "uncompressed BMP decode natively")


_FEATURES_SCHEMA = ("doc_id long, n_bytes int, content_md5 string, "
                    "width int, height int, aspect double")


def media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: byte
    length, content hash, declared-dimension aspect ratio. This is the
    slot where a real decoder would emit pixel stats / embeddings."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "content_md5": payloads.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "width": pdf["width"],
                "height": pdf["height"],
                "aspect": pdf["width"].astype("float64")
                / pdf["height"].astype("float64"),
            })

    return media.mapInPandas(extract, schema=_FEATURES_SCHEMA)


def media_features_oracle_sql() -> str:
    """Exact oracle: payload is the utf-8 text, so byte length and md5 are
    computable SQL-side (ASCII corpus ⇒ octet_length == length)."""
    return """
SELECT doc_id,
  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
  md5(text) AS content_md5,
  CAST(16 + doc_id % 64 AS INT) AS width,
  CAST(16 + (doc_id * 7) % 64 AS INT) AS height,
  CAST(16 + doc_id % 64 AS DOUBLE) / CAST(16 + (doc_id * 7) % 64 AS DOUBLE)
    AS aspect
FROM documents"""


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video-like assets: emit ``n_frames`` evenly
    spaced byte offsets per asset (a real sampler would emit decoded
    frames; offsets keep it deterministic and oracle-checkable). A
    controlled explode — output cardinality = sum(n_frames)."""
    return (media
            .select("doc_id", "n_frames",
                    F.octet_length("media").alias("n_bytes"),
                    F.explode(F.expr("sequence(0, n_frames - 1)"))
                     .alias("frame_idx"))
            .withColumn(
                "frame_off",
                F.expr("CAST(FLOOR(CAST(n_bytes AS DOUBLE) * frame_idx "
                       "/ n_frames) AS INT)"))
            .select("doc_id", "frame_idx", "frame_off"))


def sample_frames_oracle_sql() -> str:
    return """
WITH media AS (
  SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS n_frames,
         CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes
  FROM documents)
SELECT doc_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx,
  CAST(FLOOR(CAST(n_bytes AS DOUBLE) * unnest(generate_series(0, n_frames - 1))
       / n_frames) AS INT) AS frame_off
FROM media"""


_AUDIO_SCHEMA = ("doc_id long, n_samples int, sum_amp long, max_abs int, "
                 "n_zero_cross long")

#: synthetic PCM centering: byte value minus this = signed amplitude
_PCM_CENTER = 64


def audio_waveform_stats(media: DataFrame) -> DataFrame:
    """Audio-modality stage: interpret the payload as 8-bit PCM samples
    (centered at {_PCM_CENTER}) and extract waveform statistics —
    sample count, summed amplitude, peak, zero crossings. A real
    implementation swaps the byte interpretation for an audio decode
    (soundfile/librosa, absent here); the numpy-vectorized
    ``mapInPandas`` pass, schema, and no-shuffle shape are the real
    thing. All-integer outputs make the oracle exact (ASCII corpus ⇒
    byte i == codepoint of char i)."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                s = (np.frombuffer(bytes(payload), dtype=np.uint8)
                     .astype(np.int64) - _PCM_CENTER)
                crossings = int((s[:-1] * s[1:] < 0).sum()) if len(s) > 1 \
                    else 0
                rows.append((int(doc_id), len(s), int(s.sum()),
                             int(np.abs(s).max()) if len(s) else 0,
                             crossings))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "sum_amp", "max_abs",
                "n_zero_cross"])

    return media.mapInPandas(stats, schema=_AUDIO_SCHEMA)


def audio_waveform_stats_oracle_sql() -> str:
    c = _PCM_CENTER
    return f"""
WITH s AS (
  SELECT doc_id,
    list_transform(range(1, length(text) + 1),
                   i -> unicode(substr(text, i, 1)) - {c}) AS amp
  FROM documents)
SELECT doc_id,
  CAST(len(amp) AS INT) AS n_samples,
  CAST(COALESCE(list_sum(amp), 0) AS BIGINT) AS sum_amp,
  CAST(COALESCE(list_max(list_transform(amp, x -> abs(x))), 0) AS INT)
    AS max_abs,
  CAST(COALESCE(list_sum(list_transform(range(2, len(amp) + 1),
       i -> CAST(amp[i - 1] * amp[i] < 0 AS BIGINT))), 0) AS BIGINT)
    AS n_zero_cross
FROM s"""


RESIZE_BOX = 32  # fit-within target box (declared dims are 16..79)

_RESIZE_SCHEMA = ("doc_id long, width int, height int, target_w int, "
                  "target_h int, resized_bytes int, resized_md5 string")


def resize_media(media: DataFrame, box: int = RESIZE_BOX) -> DataFrame:
    """Resize stage plumbing: compute fit-within-box target dimensions
    (aspect preserved) and emit a deterministic "resized" payload — the
    prefix of the source bytes, length scaled by the area ratio — plus
    its content hash. A real implementation swaps the byte-slice for a
    PIL/libvips resample (:func:`decode_image` stub); schema, Arrow
    batching, and the no-shuffle narrow-pass shape are the real thing.

    All arithmetic is integer or IEEE-double (identical across engines);
    the binary column never shuffles — one ``mapInPandas`` over the scan.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("float64")
            h = pdf["height"].astype("float64")
            scale = (box / w).combine(box / h, min).combine(
                pd.Series(1.0, index=pdf.index), min)
            tw = (w * scale).map(int).clip(lower=1)
            th = (h * scale).map(int).clip(lower=1)
            n = pdf["media"].map(len)
            k = (n * tw * th) // (pdf["width"] * pdf["height"])
            sliced = [bytes(b)[:int(m)] for b, m in zip(pdf["media"], k)]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "target_w": tw.astype("int32"),
                "target_h": th.astype("int32"),
                "resized_bytes": k.astype("int32"),
                "resized_md5": [hashlib.md5(s).hexdigest() for s in sliced],
            })

    return media.mapInPandas(do_resize, schema=_RESIZE_SCHEMA)


def resize_media_oracle_sql(box: int = RESIZE_BOX) -> str:
    """Payload is the utf-8 text (ASCII corpus), so the byte-slice hash
    is ``md5(substr(text, 1, k))`` SQL-side."""
    return f"""
WITH m AS (
  SELECT doc_id, text,
    CAST(16 + doc_id % 64 AS INT) AS width,
    CAST(16 + (doc_id * 7) % 64 AS INT) AS height,
    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
  FROM documents),
s AS (
  SELECT *, LEAST(CAST({box} AS DOUBLE) / width,
                  CAST({box} AS DOUBLE) / height,
                  CAST(1 AS DOUBLE)) AS scale
  FROM m),
t AS (
  SELECT *, GREATEST(CAST(FLOOR(width * scale) AS INT), 1) AS target_w,
            GREATEST(CAST(FLOOR(height * scale) AS INT), 1) AS target_h
  FROM s)
SELECT doc_id, width, height, target_w, target_h,
  CAST((n_bytes * target_w * target_h) // (width * height) AS INT)
    AS resized_bytes,
  md5(substr(text, 1,
      CAST((n_bytes * target_w * target_h) // (width * height) AS INT)))
    AS resized_md5
FROM t"""


# ------------------------------------- perceptual-hash image dedup ---

PHASH_BITS = 64
PHASH_BANDS = 4
#: banded-LSH completeness bound: hamming < bands guarantees a shared band
PHASH_MAX_HAM = 3

_PHASH_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int"


def phash_signatures(media: DataFrame) -> DataFrame:
    """64-bit average-hash of the media payload, split into 4×16-bit
    bands: interpret the first 64 payload bytes as an 8×8 grayscale
    block (zero-padded; a real pipeline would decode + downsample via
    :func:`decode_image`), set bit i when pixel i exceeds the block
    mean (strict, scaled integer compare — no division), and pack bits
    16j..16j+15 into band j. Vectorized numpy over Arrow batches; the
    binary column never shuffles."""
    import numpy as np
    from collections.abc import Iterator as _It

    def sig(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            mat = np.zeros((len(pdf), PHASH_BITS), dtype=np.int64)
            for r, payload in enumerate(pdf["media"]):
                b = np.frombuffer(bytes(payload)[:PHASH_BITS],
                                  dtype=np.uint8).astype(np.int64)
                mat[r, :len(b)] = b
            bits = (mat * PHASH_BITS
                    > mat.sum(axis=1, keepdims=True)).astype(np.int64)
            w = 1 << np.arange(16, dtype=np.int64)
            out = {"doc_id": pdf["doc_id"]}
            for j in range(PHASH_BANDS):
                out[f"b{j}"] = (bits[:, 16 * j:16 * (j + 1)] * w).sum(
                    axis=1).astype("int32")
            yield pd.DataFrame(out)

    return media.mapInPandas(sig, schema=_PHASH_SCHEMA)


def phash_neardup(media: DataFrame,
                  max_ham: int = PHASH_MAX_HAM) -> DataFrame:
    """MM5 — perceptual-hash near-duplicate image pairs: banded-LSH
    candidate join over the 16-bit bands, then exact Hamming verify.

    Scale shape: with hamming ≤ max_ham < PHASH_BANDS, two near-dup
    hashes MUST agree on ≥ 1 whole band (pigeonhole), so the candidate
    set is an **equi-join on (band_idx, band_value)** — the corpus
    shuffles 4 small int rows per asset, never pairwise. The verify is
    ``bit_count(xor)`` per band, summed — integer-exact, so the oracle
    checks the pairs and distances themselves."""
    # one UDF pass total: signatures are cached and the full 4-band
    # vector rides through the explode, so the candidate equi-join needs
    # no rejoin against the signature table (and no recompute per side)
    from pyspark.storagelevel import StorageLevel
    sigs = phash_signatures(media).persist(StorageLevel.MEMORY_AND_DISK)
    bands = sigs.select(
        "doc_id", "b0", "b1", "b2", "b3",
        F.posexplode(F.expr("array(b0, b1, b2, b3)")).alias("j", "band"))
    ham = " + ".join(f"bit_count(a.b{j} ^ b.b{j})"
                     for j in range(PHASH_BANDS))
    return (bands.alias("a")
            .join(bands.alias("b"),
                  F.expr("a.j = b.j AND a.band = b.band "
                         "AND a.doc_id < b.doc_id"))
            .select(F.expr("a.doc_id").alias("doc_a"),
                    F.expr("b.doc_id").alias("doc_b"),
                    F.expr(f"CAST({ham} AS INT)").alias("hamming"))
            .filter(F.col("hamming") <= max_ham)
            .groupBy("doc_a", "doc_b")
            .agg(F.min("hamming").alias("hamming")))


def phash_neardup_oracle_sql(max_ham: int = PHASH_MAX_HAM) -> str:
    """SQL twin over the utf-8 payload (ASCII corpus ⇒ byte i ==
    codepoint of char i; beyond-length bytes are the zero padding)."""
    codes = (f"list_transform(range(1, {PHASH_BITS} + 1), "
             f"i -> GREATEST(unicode(substr(text, i, 1)), 0))")
    band = ("CAST(list_sum(list_transform(range(1, 17), "
            "i -> CAST(codes[16 * {j} + i] * {nb} > tot AS BIGINT) "
            "* (CAST(1 AS BIGINT) << (i - 1)))) AS INT)")
    band_cols = ", ".join(
        band.format(j=j, nb=PHASH_BITS) + f" AS b{j}"
        for j in range(PHASH_BANDS))
    ham = " + ".join(f"bit_count(xor(CAST(a.b{j} AS BIGINT), "
                     f"CAST(b.b{j} AS BIGINT)))"
                     for j in range(PHASH_BANDS))
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS j, b{j} AS band FROM sigs"
        for j in range(PHASH_BANDS))
    return f"""
WITH raw AS (
  SELECT doc_id, {codes} AS codes FROM documents),
tots AS (
  SELECT doc_id, codes, list_sum(codes) AS tot FROM raw),
sigs AS (
  SELECT doc_id, {band_cols} FROM tots),
bands AS ({band_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b, CAST({ham} AS INT) AS hamming
FROM cand c
JOIN sigs a ON a.doc_id = c.doc_a
JOIN sigs b ON b.doc_id = c.doc_b
WHERE ({ham}) <= {max_ham}"""


# ----------------------------------------- video scene-cut detection ---

FRAME_BYTES = 16
SCENE_CUT_THRESHOLD = 320  # sum of abs byte deltas over one frame

_SCENE_SCHEMA = ("doc_id long, n_frames int, n_cuts int, first_cut int, "
                 "max_delta int")


def scene_cuts(media: DataFrame,
               frame_bytes: int = FRAME_BYTES,
               threshold: int = SCENE_CUT_THRESHOLD) -> DataFrame:
    """MM6 — video-modality scene-cut detection: interpret the payload
    as consecutive ``frame_bytes``-byte frames and flag a cut wherever
    the summed absolute byte delta between adjacent frames exceeds the
    threshold (a real pipeline swaps the byte delta for a decoded-frame
    histogram distance — :func:`decode_image` stub). Vectorized numpy
    over Arrow batches; the binary column never shuffles; output is one
    summary row per asset. All-integer, so the oracle is exact."""
    import numpy as np
    from collections.abc import Iterator as _It

    def detect(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                nf = len(b) // frame_bytes
                if nf < 2:
                    rows.append((int(doc_id), nf, 0, -1, 0))
                    continue
                frames = b[:nf * frame_bytes].astype(np.int64).reshape(
                    nf, frame_bytes)
                deltas = np.abs(np.diff(frames, axis=0)).sum(axis=1)
                cuts = np.flatnonzero(deltas > threshold)
                rows.append((int(doc_id), nf, int(cuts.size),
                             int(cuts[0] + 1) if cuts.size else -1,
                             int(deltas.max())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_frames", "n_cuts", "first_cut", "max_delta"])

    return media.mapInPandas(detect, schema=_SCENE_SCHEMA)


def scene_cuts_oracle_sql(frame_bytes: int = FRAME_BYTES,
                          threshold: int = SCENE_CUT_THRESHOLD) -> str:
    """SQL twin over the utf-8 payload (ASCII corpus ⇒ byte == code)."""
    fb = frame_bytes
    delta = (f"list_sum(list_transform(range(1, {fb} + 1), "
             f"i -> abs(codes[f * {fb} + i] - codes[(f - 1) * {fb} + i])))")
    return f"""
WITH raw AS (
  SELECT doc_id,
    list_transform(range(1, length(text) + 1),
                   i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
      AS codes,
    CAST(length(text) // {fb} AS INT) AS n_frames
  FROM documents),
deltas AS (
  SELECT doc_id, n_frames, f, {delta} AS delta
  FROM raw, LATERAL unnest(generate_series(1, n_frames - 1)) AS g(f)
  WHERE n_frames >= 2)
SELECT r.doc_id, r.n_frames,
  CAST(COALESCE(SUM(CAST(d.delta > {threshold} AS INT)), 0) AS INT)
    AS n_cuts,
  CAST(COALESCE(MIN(CASE WHEN d.delta > {threshold} THEN d.f END), -1)
    AS INT) AS first_cut,
  CAST(COALESCE(MAX(d.delta), 0) AS INT) AS max_delta
FROM raw r LEFT JOIN deltas d USING (doc_id)
GROUP BY r.doc_id, r.n_frames"""


# ------------------------------------ MM7: audio landmark fingerprints ---

LM_MIN_AMP = 30          #: peak amplitude floor
LM_MAX_DT = 255          #: max samples between paired peaks
LM_MIN_SHARED = 3        #: landmarks shared to call two assets dups
LM_MAX_BUCKET = 16       #: skip degenerate landmark keys


def _lm_exprs(d: str) -> dict[str, str]:
    """Cross-dialect fragments: PCM amplitudes, strict local-max peak
    positions, and packed (v1, v2, dt) landmark keys."""
    c = _PCM_CENTER
    if d == "spark":
        amp = (f"transform(sequence(1, length(text)), "
               f"i -> ascii(substr(text, i, 1)) - {c})")
        seq = "sequence(3, size(a) - 2)"
        flt = "filter"
        tr = "transform"
        sz = "size"
        el = "element_at(a, {i})"
    else:
        amp = (f"list_transform(range(1, length(text) + 1), "
               f"i -> unicode(substr(text, i, 1)) - {c})")
        seq = "range(3, len(a) - 1)"
        flt = "list_filter"
        tr = "list_transform"
        sz = "len"
        el = "a[{i}]"
    def a(i):
        return el.format(i=i)
    peak = (f"{a('i')} > {a('i - 1')} AND {a('i')} > {a('i + 1')} "
            f"AND {a('i')} > {a('i - 2')} AND {a('i')} > {a('i + 2')} "
            f"AND {a('i')} >= {LM_MIN_AMP}")
    peaks = f"{flt}({seq}, i -> {peak})"
    if d == "spark":
        key = ("(element_at(a, element_at(p, k)) + 128) * 65536 "
               "+ (element_at(a, element_at(p, k + 1)) + 128) * 256 "
               "+ LEAST(element_at(p, k + 1) - element_at(p, k), "
               f"{LM_MAX_DT})")
        # sequence(1, 0) DESCENDS in Spark, and ANSI element_at on an
        # empty peak list errors — guard like textsql.seq does
        lms = (f"IF({sz}(p) >= 2, {tr}(sequence(1, {sz}(p) - 1), "
               f"k -> CAST({key} AS BIGINT)), "
               f"CAST(array() AS ARRAY<BIGINT>))")
    else:
        key = ("(a[p[k]] + 128) * 65536 + (a[p[k + 1]] + 128) * 256 "
               f"+ LEAST(p[k + 1] - p[k], {LM_MAX_DT})")
        lms = (f"{tr}(range(1, GREATEST({sz}(p) - 1, 0) + 1), "
               f"k -> CAST({key} AS BIGINT))")
    return {"amp": amp, "peaks": peaks, "landmarks": lms}


def audio_landmark_pairs(docs: DataFrame,
                         min_shared: int = LM_MIN_SHARED,
                         max_bucket: int = LM_MAX_BUCKET) -> DataFrame:
    """MM7 — audio near-dup via **landmark (constellation) fingerprints**
    (the Shazam/Wang 2003 shape): strict local-max peaks in the 8-bit
    PCM waveform pair up into (peak1, peak2, Δt) landmark keys; assets
    sharing ≥ ``min_shared`` keys are duplicate candidates.
    → (doc_a, doc_b, n_shared).

    Scale shape: peaks/landmarks are an in-row projection (no UDF — at
    real scale the decode would be the Arrow ``mapInPandas`` pass like
    the other media stages, the landmark algebra stays identical); the
    inverted (key → assets) index is one map-side-combined groupBy;
    pairs expand IN-ROW from each key's sorted asset set (capped at
    ``max_bucket`` — degenerate keys are dropped like SimHash's hot
    buckets); the final count groups on candidate pairs, never
    asset × asset."""
    e = _lm_exprs("spark")
    lm = (docs
          .select("doc_id", F.expr(e["amp"]).alias("a"))
          .select("doc_id", F.expr(e["peaks"]).alias("p"), "a")
          .select("doc_id", F.explode(F.expr(e["landmarks"])).alias("key"))
          .distinct())
    pairs = ("flatten(transform(ids, (x, i) -> "
             "transform(slice(ids, i + 2, size(ids)), "
             "y -> concat(CAST(x AS STRING), '#', CAST(y AS STRING)))))")
    return (lm.groupBy("key")
            .agg(F.expr("array_sort(collect_set(doc_id))").alias("ids"))
            .filter(F.expr(f"size(ids) BETWEEN 2 AND {max_bucket}"))
            .select(F.explode(F.expr(pairs)).alias("pair"))
            .groupBy("pair")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
            .select(F.expr("CAST(split_part(pair, '#', 1) AS BIGINT)")
                    .alias("doc_a"),
                    F.expr("CAST(split_part(pair, '#', 2) AS BIGINT)")
                    .alias("doc_b"),
                    "n_shared"))


def audio_landmark_pairs_oracle_sql(min_shared: int = LM_MIN_SHARED,
                                    max_bucket: int = LM_MAX_BUCKET) -> str:
    e = _lm_exprs("duck")
    return f"""
WITH amp AS (SELECT doc_id, {e['amp']} AS a FROM documents),
pk AS (SELECT doc_id, {e['peaks']} AS p, a FROM amp),
lm AS (
  SELECT DISTINCT doc_id, unnest({e['landmarks']}) AS key FROM pk),
buckets AS (
  SELECT key, list_sort(list(DISTINCT doc_id)) AS ids
  FROM lm GROUP BY key
  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {max_bucket}),
pairs AS (
  SELECT unnest(flatten(list_transform(ids, (x, i) ->
    list_transform(ids[i + 1:], y ->
      CAST(x AS VARCHAR) || '#' || CAST(y AS VARCHAR))))) AS pair
  FROM buckets)
SELECT CAST(split_part(pair, '#', 1) AS BIGINT) AS doc_a,
  CAST(split_part(pair, '#', 2) AS BIGINT) AS doc_b,
  COUNT(*) AS n_shared
FROM pairs GROUP BY pair
HAVING COUNT(*) >= {min_shared}"""


# ------------------------------------------- mm9: REAL pixel decode ---

def make_pgm(doc_id: int) -> bytes:
    """Deterministic two-band P5 test image for ``doc_id``: dimensions
    w = 8 + doc_id % 16, h = 6 + (doc_id * 3) % 12; the top h DIV 2
    rows hold value a = doc_id % 256, the rest b = (doc_id * 97) % 256.
    Two bands prove raster orientation and dimension decode; the
    closed forms keep the oracle exact SQL."""
    import numpy as np
    w = 8 + doc_id % 16
    h = 6 + (doc_id * 3) % 12
    a = doc_id % 256
    b = (doc_id * 97) % 256
    img = np.empty((h, w), np.uint8)
    img[: h // 2] = a
    img[h // 2:] = b
    return b"P5\n# birli_spark test image\n%d %d\n255\n" % (w, h) \
        + img.tobytes()


def attach_pgm_media(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media) with REAL P5 payloads (the decode
    fixture generator; generation is Arrow-batched like the features
    pass)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media": pdf["doc_id"].map(lambda d: make_pgm(int(d))),
            })
    return docs.select("doc_id").mapInPandas(gen,
                                             schema="doc_id long, media binary")


_PIXEL_SCHEMA = ("doc_id long, width int, height int, px_min int, "
                 "px_max int, px_mean double, top_left int, "
                 "bottom_right int")


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """mm9 — REAL decoded-pixel statistics: :func:`decode_image` each
    payload in the Arrow batch, emit dimensions, min/max/mean and the
    two orientation-proving corner pixels. The binary column never
    shuffles — decode runs in the narrow ``mapInPandas`` pass over the
    scan and only these tiny feature rows move."""
    import numpy as np
    from birli_spark.functions.complex import f32 as _f32  # noqa: F401

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                img = decode_image(payload)
                if img.ndim == 3:
                    img = img[:, :, 0]
                h, w = img.shape
                rows.append({
                    "doc_id": int(doc_id), "width": w, "height": h,
                    "px_min": int(img.min()), "px_max": int(img.max()),
                    # f32-demoted mean (exact integer sum / exact count)
                    "px_mean": float(np.float32(
                        float(img.sum(dtype=np.int64)) / (w * h))),
                    "top_left": int(img[0, 0]),
                    "bottom_right": int(img[-1, -1]),
                })
            yield pd.DataFrame(rows, columns=[
                c.split()[0] for c in _PIXEL_SCHEMA.split(", ")])

    return media.mapInPandas(extract, schema=_PIXEL_SCHEMA)


def image_pixel_stats_oracle_sql() -> str:
    """Closed-form oracle of the generator+decode composition: every
    statistic derives from doc_id alone (see :func:`make_pgm`)."""
    from birli_spark.functions.complex import f32
    w = "(8 + doc_id % 16)"
    h = "(6 + (doc_id * 3) % 12)"
    a = "(doc_id % 256)"
    b = "((doc_id * 97) % 256)"
    top = f"({h} / 2)"          # integer division in both dialects? no:
    # DuckDB / on ints is float — spell integer div portably
    top = f"CAST(FLOOR({h} / 2.0) AS BIGINT)"
    mean = f32(f"CAST({top} * {a} + ({h} - {top}) * {b} AS DOUBLE)"
               f" / {h}")
    return f"""
SELECT doc_id,
  CAST({w} AS INT) AS width,
  CAST({h} AS INT) AS height,
  CAST(LEAST({a}, {b}) AS INT) AS px_min,
  CAST(GREATEST({a}, {b}) AS INT) AS px_max,
  {mean} AS px_mean,
  CAST({a} AS INT) AS top_left,
  CAST({b} AS INT) AS bottom_right
FROM documents"""
