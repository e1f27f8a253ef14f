"""p2pddsketch_spark — a PySpark-native distributed sketch / approximate
aggregation library.

Centerpiece: DDSketch (log-γ bucketed quantile estimation with relative
error guarantee α and bounded bucket collapsing), alongside HyperLogLog,
count-min, t-digest, KLL, and Bloom — all mergeable, associative
aggregators driven by vectorized Arrow/pandas UDFs and a two-level
shuffle merge tree (no per-row Python anywhere on the hot path).

The reference system (gmorleo/p2pDDSketch, studied at /root/reference)
computes the same sketch algebra over a simulated P2P gossip topology;
here the gossip averaging protocol is replaced wholesale by Spark's
exact shuffle-based partial aggregation.
"""

from p2pddsketch_spark.sketches.ddsketch import DDSketch
from p2pddsketch_spark.sketches.hll import HyperLogLog
from p2pddsketch_spark.sketches.cms import CountMinSketch
from p2pddsketch_spark.sketches.bloom import BloomFilter
from p2pddsketch_spark.sketches.kll import KLLSketch
from p2pddsketch_spark.sketches.kll_turnstile import TurnstileKLL
from p2pddsketch_spark.sketches.bottomk import BottomKSample
from p2pddsketch_spark.sketches.spacesaving import SpaceSaving
from p2pddsketch_spark.sketches.tdigest import TDigest
from p2pddsketch_spark.sketches.theta import ThetaSketch

__all__ = [
    "DDSketch", "HyperLogLog", "CountMinSketch", "BloomFilter",
    "KLLSketch", "TurnstileKLL", "TDigest", "SpaceSaving", "ThetaSketch", "BottomKSample",
]
__version__ = "0.1.0"
