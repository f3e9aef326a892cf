"""Minimal FITS primitives shared by the UVFITS sink and the gpubox
source: 80-char header cards, 2880-byte block padding, and a header
parser. Pure numpy/bytes — no astropy in this environment; the subset
implemented (SIMPLE/IMAGE HDUs, BITPIX=-32, random groups) follows the
published FITS 4.0 standard.
"""

from __future__ import annotations

BLOCK = 2880


def card(key: str, value, comment: str = "") -> bytes:
    """One 80-byte header card."""
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, float)):
        s = f"{key:<8}= {value:>20}"
    elif value is None:
        s = f"{key:<80}"[:80]
        return s.encode("ascii")
    else:
        s = f"{key:<8}= '{value}'"
    if comment:
        s += f" / {comment}"
    return f"{s:<80}"[:80].encode("ascii")


def end_card() -> bytes:
    return f"{'END':<80}".encode("ascii")


def pad_block(b: bytes, fill: bytes = b" ") -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + fill * (BLOCK - rem)


def parse_header(raw: bytes, off: int = 0) -> tuple[dict, int]:
    """Parse one header unit starting at ``off`` → (cards, offset past the
    header's last 2880 block). Values are str/bool/int/float."""
    header: dict[str, object] = {}
    done = False
    while not done:
        block = raw[off:off + BLOCK]
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        off += BLOCK
        for i in range(0, BLOCK, 80):
            c = block[i:i + 80].decode("ascii")
            key = c[:8].strip()
            if key == "END":
                done = True
                break
            if "=" not in c[:10]:
                continue
            val = c[9:].split("/")[0].strip()
            if val.startswith("'"):
                header[key] = val.strip("'").strip()
            elif val in ("T", "F"):
                header[key] = val == "T"
            else:
                header[key] = float(val) if "." in val else int(val)
    return header, off


def data_size_bytes(header: dict) -> int:
    """Size of the data unit described by ``header`` (before padding)."""
    naxis = int(header.get("NAXIS", 0))
    if naxis == 0:
        return 0
    n = 1
    for i in range(1, naxis + 1):
        n *= int(header[f"NAXIS{i}"])
    if header.get("GROUPS") and int(header.get("NAXIS1", -1)) == 0:
        # random groups: NAXIS1=0 is a marker, groups counted by GCOUNT
        n = 1
        for i in range(2, naxis + 1):
            n *= int(header[f"NAXIS{i}"])
        n = (n + int(header.get("PCOUNT", 0))) * int(header.get("GCOUNT", 1))
    return n * abs(int(header["BITPIX"])) // 8


def skip_data(off: int, header: dict) -> int:
    size = data_size_bytes(header)
    rem = size % BLOCK
    return off + size + (BLOCK - rem if rem else 0)
