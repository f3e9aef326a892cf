"""Live RFI monitoring of an observation still being written — the
streaming showcase: gpubox time segments arrive as files (the
correlator's batch-00, batch-01, … naming, reference
src/io/mwaf.rs:106-138 template discussion), the S1f gpubox stream
source picks each up exactly once (checkpointed offsets), the
streaming SSINS twin (streaming/ssins.py) diffs adjacent timesteps
against 8 doubles of carried state per (baseline, channel), and the
drained incoherent noise image is robust-scored to localize an
injected RFI burst — all while the "observation" keeps growing.

The monitor survives a restart between segments: the second run picks
up ONLY the new files and its first difference crosses the segment
boundary through the checkpoint-restored state.

Run: python examples/live_rfi_monitor.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from birli_spark.session import get_spark  # noqa: E402
from birli_spark.sources import gpubox  # noqa: E402
from birli_spark.streaming import ssins as sssins  # noqa: E402

NUM_ANTS = 4
NUM_FINE = 8
NUM_CC = 2
SEG_TS = 6          # timesteps per arriving segment
# (t, global chan, amplitude) injected in segment 2 — the synthetic
# coordinate-encoded "sky" is NOT static between timesteps (unlike a
# real observation), so the burst must exceed its ~5.8k difference
# floor to stand out of the channel's robust scale
BURST = (8, 11, 3000.0)


def write_segment(obs_dir: str, seg: int, burst=None) -> None:
    for cc in range(NUM_CC):
        gpubox.write_gpubox(
            os.path.join(obs_dir, f"gpubox{cc:02d}_{seg:02d}.fits"),
            cc_idx=cc, num_ants=NUM_ANTS, num_fine=NUM_FINE,
            num_timesteps=SEG_TS, t_start=seg * SEG_TS, burst=burst)


def drain_new_segments(spark, obs_dir: str, ckpt: str, amp_out: str) -> None:
    """One monitoring pass: process every not-yet-seen gpubox file
    through the stateful SSINS differencer, appending amplitudes."""
    gpubox.register_gpubox_source(spark)
    stream = (spark.readStream.format("gpubox")
              .load(os.path.join(obs_dir, "*.fits")))
    q = (sssins.ssins_amp_stream(stream)
         .writeStream.format("parquet")
         .option("path", amp_out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(300)


def main() -> dict:
    spark = get_spark("live_rfi_monitor")
    work = tempfile.mkdtemp(prefix="live_rfi_")
    obs_dir = os.path.join(work, "obs")
    os.makedirs(obs_dir)
    ckpt = os.path.join(work, "ckpt")
    amp_out = os.path.join(work, "amps")

    # --- segment 0 arrives; monitor drains it (clean sky) -------------
    write_segment(obs_dir, 0)
    drain_new_segments(spark, obs_dir, ckpt, amp_out)
    n0 = spark.read.parquet(amp_out).count()
    print(f"segment 0 drained: {n0} difference-amplitude rows")

    # --- segment 1 arrives WITH an RFI burst; monitor restarts --------
    write_segment(obs_dir, 1, burst=BURST)
    drain_new_segments(spark, obs_dir, ckpt, amp_out)
    amps = spark.read.parquet(amp_out)
    n1 = amps.count()
    print(f"segment 1 drained: +{n1 - n0} rows (state crossed the "
          f"segment boundary: t={SEG_TS} diffs exist: "
          f"{amps.filter(f't = {SEG_TS}').count() > 0})")

    # --- score the drained noise image, report flagged cells ----------
    ins = sssins.ins_from_updates(amps)
    scored = sssins.score_drained(ins, threshold=5.0)
    flagged = sorted((r.t, r.chan) for r in
                     scored.filter("rfi_flag").collect())
    print(f"flagged (t, chan) cells: {flagged}")
    burst_cells = [(BURST[0], BURST[1]), (BURST[0] + 1, BURST[1])]
    assert all(c in flagged for c in burst_cells), (flagged, burst_cells)
    print("burst localized: both difference cells straddling "
          f"t={BURST[0]}, chan={BURST[1]} flagged")
    result = {"flagged": flagged, "amp_rows": n1,
              "crossed_boundary": amps.filter(f"t = {SEG_TS}").count() > 0}
    spark.stop()
    return result


if __name__ == "__main__":
    main()
