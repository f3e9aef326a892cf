"""P6 — time chunking (SURVEY.md §2.2; reference ``parse_chunk_matches``,
src/cli.rs:1260-1331, and the chunk loop src/cli.rs:1780-1830).

In the reference this is a single-node memory-management device: process
N timesteps at a time, N either given (``--time-chunk``, must divide by
the averaging factor) or derived from a memory budget
(``floor(max_mem / bytes_per_avg_block) * avg_time``). Spark's
partitioned execution makes the memory motive moot (SURVEY.md §4) — the
equivalent physical control is **range partitioning on the time axis**,
which this module exposes so sinks that want chunk-grain files (e.g. the
reference's incremental UVFITS appends) get them, with chunk boundaries
kept at multiples of ``avg_time`` so no averaging block ever straddles a
chunk (src/cli.rs:1286-1295).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_size_from_memory(max_mem_bytes: float, bytes_per_timestep: int,
                           num_timesteps: int, avg_time: int) -> int | None:
    """The reference's derivation (src/cli.rs:1297-1321): None = no
    chunking needed (everything fits); raises when the budget cannot hold
    one averaged block."""
    bytes_selected = bytes_per_timestep * num_timesteps
    bytes_per_avg_block = bytes_per_timestep * avg_time
    if max_mem_bytes < 1.0:
        raise ValueError("max memory must be at least one byte")
    if max_mem_bytes >= bytes_selected:
        return None
    if max_mem_bytes < bytes_per_avg_block:
        raise ValueError(
            f"need at least one averaged block ({bytes_per_avg_block} B)")
    return int(max_mem_bytes / bytes_per_avg_block) * avg_time


def validate_chunk_size(num_timesteps_per_chunk: int, avg_time: int) -> None:
    """--time-chunk must be a multiple of avg_time (src/cli.rs:1286-1295)."""
    if num_timesteps_per_chunk % avg_time != 0:
        raise ValueError(
            f"time chunk {num_timesteps_per_chunk} is not a multiple of "
            f"the temporal averaging factor {avg_time}")


def with_time_chunks(vis: DataFrame, num_timesteps_per_chunk: int,
                     avg_time: int = 1) -> DataFrame:
    """Assign chunk ids and range-partition by them: each output partition
    holds whole chunks, so a chunk-grain sink writes sequential time
    slabs exactly like the reference's chunk loop."""
    validate_chunk_size(num_timesteps_per_chunk, avg_time)
    chunked = vis.withColumn(
        "chunk", F.expr(f"CAST(FLOOR(t / {num_timesteps_per_chunk}) AS INT)"))
    return chunked.repartitionByRange("chunk", "t")


def chunk_assignment_sql(vis: str, num_timesteps_per_chunk: int) -> str:
    """Oracle: the distinct (chunk, t) mapping."""
    return (f"SELECT DISTINCT CAST(FLOOR(t / {num_timesteps_per_chunk}) AS INT)"
            f" AS chunk, t FROM {vis}")


#: the reference's per-cell memory estimate behind --max-memory: one
#: Jones<f32> (8 f32 = 32 B) + one f32 weight + one bool flag per
#: (timestep, channel, baseline) cell (marlu
#: VisSelection::estimate_bytes_best, consumed at src/cli.rs:1306-1308)
BYTES_PER_CELL = 32 + 4 + 1


def chunk_steps_from_memory(vis: DataFrame, max_memory_gib: float,
                            avg_time: int) -> int | None:
    """``--max-memory`` semantics (reference src/cli.rs:1297-1321):
    estimate the selected cube's footprint with the reference's own
    per-cell constant and derive the ``--time-chunk`` step count that
    fits the budget. None = the whole selection fits (no chunking).

    The dims come from ONE dim-sized aggregate over the selected
    relation (three distinct counts — the same information the
    reference reads from its metadata context; this stays a bounded
    driver-side scalar at any data volume)."""
    nt, nbl, nch = vis.selectExpr(
        "COUNT(DISTINCT t)", "COUNT(DISTINCT bl)",
        "COUNT(DISTINCT chan)").first()
    bytes_per_timestep = int(nbl) * int(nch) * BYTES_PER_CELL
    return chunk_size_from_memory(
        float(max_memory_gib) * 1024.0 ** 3,
        bytes_per_timestep, int(nt), avg_time)
