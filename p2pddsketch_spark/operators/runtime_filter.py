"""Sketch-backed runtime join filters.

The reference engine ships every peer a compact summary of the data
before querying (`/root/reference/main.cpp:419-470` builds per-peer
state that `graph.cpp` gossips); the Spark-first analogue of "summarize
once, prune everywhere" is a runtime filter: build a Bloom filter over
the join keys of the *selective* side, broadcast the kilobytes-sized
bitset, and drop non-matching fact rows BEFORE the shuffle join. At
100 TB the shuffle of the fact table dominates join cost, so a 10%
selective dim becomes a ~10× shuffle-volume cut, while the exact join
afterwards removes the Bloom false positives — the final result is
bit-identical to the plain join.

Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` does this
transparently for some plan shapes; this operator makes it explicit,
works for any int64 key, and reuses the library's mergeable
`BloomFilter` (built distributed, one bitset per partition, OR-merged —
only bitsets reach the driver, never keys).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from p2pddsketch_spark.sketches.bloom import BloomFilter


def bloom_filter_of(dim: DataFrame, dim_key: str,
                    m_bits: int = 1 << 22, k: int = 5) -> BloomFilter:
    """Distributed Bloom build over `dim[dim_key]` (int64): each
    partition folds its keys into a local bitset via one vectorized
    `update_batch`, and the driver OR-merges the partial bitsets
    (`m_bits/8` bytes each — the only data that leaves the executors)."""
    import pyarrow as pa

    def build(batches):
        bf = BloomFilter(m_bits=m_bits, k=k)
        for batch in batches:
            col = batch.column(0)
            if col.null_count:
                col = col.drop_null()
            vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
            if len(vals):
                bf.update_batch(vals)
        yield pa.RecordBatch.from_pydict({"blob": [bf.to_bytes()]})

    partials = dim.select(dim_key).mapInArrow(build, "blob binary").collect()
    merged = BloomFilter(m_bits=m_bits, k=k)
    for row in partials:
        merged.merge(BloomFilter.from_bytes(row["blob"]))
    return merged


def bloom_semi_filter(fact: DataFrame, fact_key: str,
                      dim: DataFrame, dim_key: str,
                      m_bits: int = 1 << 22, k: int = 5) -> DataFrame:
    """Return `fact` rows whose int64 `fact_key` *may* appear in
    `dim[dim_key]` — no false negatives; FP rate set by `m_bits`/`k`.

    The merged filter is broadcast and probed in a vectorized
    `mapInArrow` stage (`RecordBatch.filter` on a numpy membership
    mask — no pandas materialization, no shuffle). Schema passes
    through unchanged; callers should column-prune `fact` FIRST, since
    a Python stage is a pruning barrier for Catalyst.
    """
    spark = fact.sparkSession
    blob = spark.sparkContext.broadcast(
        bloom_filter_of(dim, dim_key, m_bits=m_bits, k=k).to_bytes())
    key_idx = fact.columns.index(fact_key)

    def probe(batches):
        import pyarrow as pa
        bf = BloomFilter.from_bytes(blob.value)
        for batch in batches:
            keys = batch.column(key_idx).to_numpy(zero_copy_only=False)
            keep = bf.contains(keys.astype(np.int64))
            yield batch.filter(pa.array(keep))

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in fact.schema.fields)
    return fact.mapInArrow(probe, schema)
