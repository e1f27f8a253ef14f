"""XXH64 (the hash behind Spark's `xxhash64`) re-expressed in pure
ANSI-ish DuckDB SQL — HUGEINT mod-2^64 arithmetic, list comprehensions
for lane extraction, `list_reduce` folds for the variable-length
phases.

Why: the two remaining rows-only gate queries (`minhash_lsh_pairs_prod`,
`simhash_neardup_pairs`) are "hash-dependent by nature" ONLY because
DuckDB lacks xxhash64. With the hash itself in SQL, the full MinHash /
SimHash pipelines become oracle-checkable end-to-end. The same
split-constant multiplication trick as the repo's Horner-mod-2^64
rolling-fingerprint twin keeps every intermediate inside HUGEINT
(signed 128-bit): x·P with variable x < 2^64 and constant prime P is
computed as ((x·P_hi) mod 2^32)·2^32 + x·P_lo, bounded by 2^97.

`xxh64_py` is the byte-exact Python reference used by the tests to pin
the SQL generator against Spark's JVM implementation.
"""

from __future__ import annotations

M64 = 1 << 64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


# ------------------------------------------------------ Python reference

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & (M64 - 1)


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) % M64
    return (_rotl(acc, 31) * P1) % M64


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * P1 + P4) % M64


def xxh64_py(data: bytes, seed: int = 42) -> int:
    """Byte-exact XXH64 (matches Spark's `xxhash64` for string input
    when `data` is the UTF-8 bytes and seed=42)."""
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + P1 + P2) % M64
        a2 = (seed + P2) % M64
        a3 = seed % M64
        a4 = (seed - P1) % M64
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i:i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8:i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16:i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) % M64
        for acc in (a1, a2, a3, a4):
            h = _merge_round(h, acc)
    else:
        h = (seed + P5) % M64
    h = (h + n) % M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) % M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) % M64
        h = (_rotl(h, 23) * P2 + P3) % M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) % M64
        h = (_rotl(h, 11) * P1) % M64
        i += 1
    h ^= h >> 33
    h = (h * P2) % M64
    h ^= h >> 29
    h = (h * P3) % M64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """As int64 (Spark's LongType view of the same bits)."""
    h = xxh64_py(data, seed)
    return h - M64 if h >= (1 << 63) else h


# ------------------------------------------------------ SQL generator

_M64L = "18446744073709551616::HUGEINT"


def _sm64(x: str) -> str:
    return f"(({x}) % {_M64L})"


def _scmul(x: str, p: int) -> str:
    """x·p mod 2^64 for variable x < 2^64 and constant p, inside
    HUGEINT: ((x·p_hi) mod 2^32)·2^32 + x·p_lo, bounded by 2^97."""
    hi, lo = p >> 32, p & 0xFFFFFFFF
    return (f"((((({x}) * {hi}::HUGEINT) % 4294967296) * 4294967296"
            f" + ({x}) * {lo}::HUGEINT) % {_M64L})")


def _srotl(x: str, r: int) -> str:
    return _sm64(f"(({x}) << {r}) + (({x}) >> {64 - r})")


def _sxor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _sround(acc: str, lane: str) -> str:
    return _scmul(_srotl(_sm64(f"({acc}) + {_scmul(lane, P2)}"), 31), P1)


def _lane8(bs: str, off0: str) -> str:
    """Little-endian u64 lane at 0-based byte offset expression."""
    terms = [f"({bs})[({off0}) + {j + 1}]::HUGEINT * {1 << (8 * j)}"
             for j in range(8)]
    return "(" + " + ".join(terms) + ")"


def xxhash64_sql_ctes(input_cte: str, str_col: str, out: str,
                      seed: int = 42) -> str:
    """CTE chain hashing `input_cte`(… {str_col} VARCHAR …) with XXH64:
    appends CTEs `{out}_b0 … {out}` where `{out}` = input columns plus
    `h` (HUGEINT in [0, 2^64)) — bit-compatible with Spark's
    `xxhash64({str_col})` reinterpreted as unsigned. ASCII input only
    (byte extraction via `ascii(substring(...))`)."""
    s, o = str_col, out
    a1_0 = (seed + P1 + P2) % M64
    a2_0 = (seed + P2) % M64
    a3_0 = seed % M64
    a4_0 = (seed - P1) % M64
    stripe_lambda = ("(acc, x) -> {"
                     + ", ".join(f"'a{i}': {_sround(f'acc.a{i}', f'x.a{i}')}"
                                 for i in (1, 2, 3, 4)) + "}")
    stripes = ("[{" + ", ".join(
        f"'a{i}': {_lane8('bs', f'32*k + {8 * (i - 1)}')}" for i in (1, 2, 3, 4))
        + "} for k in range(0, n // 32)]")
    r0x = _scmul(_srotl(_scmul("x", P2), 31), P1)       # round(0, x)
    fold8_lambda = (f"(acc, x) -> {_sm64(_scmul(_srotl(_sxor('acc', r0x), 27), P1) + ' + ' + str(P4))}")
    byte_lambda = f"(acc, x) -> {_scmul(_srotl(_sxor('acc', _sm64(f'x * {P5}')), 11), P1)}"
    merged = _sm64(" + ".join(_srotl(f"f.a{i}", r)
                             for i, r in ((1, 1), (2, 7), (3, 12), (4, 18))))
    lane4 = "(" + " + ".join(
        f"bs[(n // 8) * 8 + {j + 1}]::HUGEINT * {1 << (8 * j)}" for j in range(4)) + ")"
    step4 = _sm64(_scmul(_srotl(_sxor("h8", _sm64(f"{lane4} * {P1}")), 23), P2)
                 + f" + {P3}")
    return f"""
{o}_b0 AS (
  SELECT *, length({s}) AS n,
         [ascii(substring({s}, i, 1)) for i in range(1, length({s}) + 1)] AS bs
  FROM {input_cte}),
{o}_st AS (
  SELECT *, CASE WHEN n >= 32 THEN list_reduce(list_prepend(
      {{'a1': {a1_0}::HUGEINT, 'a2': {a2_0}::HUGEINT,
        'a3': {a3_0}::HUGEINT, 'a4': {a4_0}::HUGEINT}},
      {stripes}), {stripe_lambda}) END AS f
  FROM {o}_b0),
{o}_m0 AS (SELECT *, CASE WHEN n >= 32 THEN {merged}
                     ELSE {(seed + P5) % M64}::HUGEINT END AS m0 FROM {o}_st),
{o}_m1 AS (SELECT *, CASE WHEN n >= 32 THEN {_sm64(_scmul(_sxor('m0', _sround('0::HUGEINT', 'f.a1')), P1) + f' + {P4}')} ELSE m0 END AS m1 FROM {o}_m0),
{o}_m2 AS (SELECT *, CASE WHEN n >= 32 THEN {_sm64(_scmul(_sxor('m1', _sround('0::HUGEINT', 'f.a2')), P1) + f' + {P4}')} ELSE m1 END AS m2 FROM {o}_m1),
{o}_m3 AS (SELECT *, CASE WHEN n >= 32 THEN {_sm64(_scmul(_sxor('m2', _sround('0::HUGEINT', 'f.a3')), P1) + f' + {P4}')} ELSE m2 END AS m3 FROM {o}_m2),
{o}_m4 AS (SELECT *, CASE WHEN n >= 32 THEN {_sm64(_scmul(_sxor('m3', _sround('0::HUGEINT', 'f.a4')), P1) + f' + {P4}')} ELSE m3 END AS m4 FROM {o}_m3),
{o}_hl AS (SELECT *, {_sm64('m4 + n')} AS hl FROM {o}_m4),
{o}_h8 AS (
  SELECT *, list_reduce(list_prepend(hl,
      [{_lane8('bs', '(n // 32) * 32 + 8 * j')}
       for j in range(0, n // 8 - 4 * (n // 32))]), {fold8_lambda}) AS h8
  FROM {o}_hl),
{o}_h4 AS (SELECT *, CASE WHEN (n % 8) >= 4 THEN {step4} ELSE h8 END AS h4
           FROM {o}_h8),
{o}_hb AS (
  SELECT *, list_reduce(list_prepend(h4,
      [bs[i]::HUGEINT
       for i in range((n // 8) * 8 + ((n % 8) // 4) * 4 + 1, n + 1)]),
      {byte_lambda}) AS hb
  FROM {o}_h4),
{o}_a1 AS (SELECT *, {_scmul(_sxor('hb', 'hb >> 33'), P2)} AS v1 FROM {o}_hb),
{o}_a2 AS (SELECT *, {_scmul(_sxor('v1', 'v1 >> 29'), P3)} AS v2 FROM {o}_a1),
{o} AS (SELECT * EXCLUDE (n, bs, f, m0, m1, m2, m3, m4, hl, h8, h4, hb, v1, v2),
               {_sxor('v2', 'v2 >> 32')} AS h FROM {o}_a2)"""
