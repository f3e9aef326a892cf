"""birli_spark — a PySpark-native visibility preprocessing & analytics engine.

A brand-new engine with the query/data-processing capabilities of
MWATelescope/Birli (studied read-only at /root/reference), re-expressed as
idiomatic Spark DataFrame/SQL operators over a long-format visibility fact
table (one row per (timestep, baseline, fine_channel)) with broadcast-joined
metadata dimensions.

Design invariants (SURVEY.md §7):
  - long-format fact DataFrame; dims broadcast-joined (star schema);
  - corrections are native Column expressions (promote f64 → compute →
    demote f32, matching the reference's rounding, e.g. Birli
    src/corrections.rs:133-138);
  - UDF islands only where the reference is genuinely iterative (Van Vleck
    Newton inversions) or image-based (SumThreshold RFI);
  - flags stay boolean until the sink; weight-sign baking is the last step
    before averaging (src/cli.rs:1874-1880);
  - every operator is designed for 100 TB scale: partition pruning on
    (cc, t), broadcast-only joins on dims, map-side partial aggregation.
"""

__version__ = "0.1.0"

from birli_spark.session import get_spark  # noqa: F401
