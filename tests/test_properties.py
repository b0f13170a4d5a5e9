"""Property-based tests (hypothesis) for the deterministic kernels.

The oracle-parity suite pins fixed testdata; these pin the *functions* over
adversarial inputs: fixed-point scaling vs an exact Decimal reference, the
rolling-hash fingerprint vs a pure-python fold, shingling at degenerate
lengths (the descending-``sequence`` trap), and partitioning-invariance of
the sums the bench queries rely on.

Each example round-trips through a real Spark job, so example counts are kept
small; the properties themselves (associativity, exactness, boundary cases)
do the generalizing.
"""

from __future__ import annotations

import decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from librarian_spark.functions.numeric import slong
from librarian_spark.functions.textfns import (
    FP_MOD,
    fingerprint,
    shingles_of_tokens,
    tokens,
)

_SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# doubles in the money-ish range the fixed-point helpers are specified for
_money = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _py_slong(x: float, scale: int = 4) -> int:
    """Reference: round(x·10^s) half-away-from-zero, via exact Decimal."""
    return int(
        decimal.Decimal(x).scaleb(scale).quantize(0, rounding=decimal.ROUND_HALF_UP)
        if x >= 0
        else -(
            decimal.Decimal(-x)
            .scaleb(scale)
            .quantize(0, rounding=decimal.ROUND_HALF_UP)
        )
    )


@_SET
@given(st.lists(_money, min_size=1, max_size=30))
def test_slong_matches_decimal_reference(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r.v for r in df.select(slong("x").alias("v")).collect()]
    assert got == [_py_slong(x) for x in xs]


@_SET
@given(st.lists(_money, min_size=1, max_size=30), st.randoms())
def test_fixed_point_sum_is_order_and_partition_invariant(spark, xs, rnd):
    shuffled = list(xs)
    rnd.shuffle(shuffled)
    a = (
        spark.createDataFrame([(x,) for x in xs], "x double")
        .repartition(7)
        .agg(F.sum(slong("x")).alias("s"))
        .collect()[0]
        .s
    )
    b = (
        spark.createDataFrame([(x,) for x in shuffled], "x double")
        .repartition(2)
        .agg(F.sum(slong("x")).alias("s"))
        .collect()[0]
        .s
    )
    assert a == b == sum(_py_slong(x) for x in xs)


_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


def _py_fingerprint(s: str, mod: int = FP_MOD) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % mod
    return h


@_SET
@given(st.lists(_ascii_text, min_size=1, max_size=20))
def test_fingerprint_matches_python_fold(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.fp for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert got == [_py_fingerprint(t) for t in texts]


_word = st.text(alphabet="abcd", min_size=1, max_size=3)


def _py_shingles(toks: list[str], n: int) -> list[str]:
    seen: dict[str, None] = {}
    for i in range(len(toks) - n + 1):
        seen.setdefault(" ".join(toks[i : i + n]), None)
    return list(seen)


@_SET
@given(st.lists(_word, min_size=0, max_size=8), st.integers(2, 5))
def test_shingles_match_reference_including_short_docs(spark, toks, n):
    """Docs SHORTER than the n-gram width must shingle to [] — the
    descending-sequence phantom-shingle regression stays dead."""
    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string").select(
        tokens("text").alias("_w")
    )
    got = df.select(shingles_of_tokens("_w", n).alias("s")).collect()[0].s
    # Spark's split('', ' ') yields [''] like the tokenizer contract
    expected = _py_shingles(text.split(" ") if text else [""], n)
    assert got == expected


@pytest.mark.parametrize("partitions", [1, 5])
def test_minhash_signatures_partition_invariant(spark, sf_dir, partitions):
    """Band signatures are a pure per-row function: identical under any
    partitioning (the determinism the LSH join correctness rests on)."""
    from librarian_spark.operators.dedup import minhash_features

    base = {
        (r.doc_id, tuple(r.band_sigs))
        for r in minhash_features(spark, sf_dir).collect()
    }
    repart = {
        (r.doc_id, tuple(r.band_sigs))
        for r in minhash_features(spark, sf_dir)
        .repartition(partitions)
        .collect()
    }
    assert base == repart


# -- new-operator semantics pins (round 3, part 3) -------------------------


def test_zorder_key_deinterleaves_exactly(spark):
    """On a dense domain where scaling is the identity, the Morton key must be
    a perfect interleave: de-interleaving its bits recovers both inputs, and
    the key is monotone in each dimension with the other fixed."""
    from librarian_spark.maintenance import zorder_key

    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y",
        zorder_key(["x", "y"], [0, 0], [15, 15], bits=bits).alias("z"),
    ).collect()
    for r in out:
        dx = sum(((r.z >> (2 * b)) & 1) << b for b in range(bits))
        dy = sum(((r.z >> (2 * b + 1)) & 1) << b for b in range(bits))
        assert (dx, dy) == (r.x, r.y), (r.x, r.y, r.z)
    by_xy = {(r.x, r.y): r.z for r in out}
    for y in range(16):
        keys = [by_xy[(x, y)] for x in range(16)]
        assert keys == sorted(keys)
    for x in range(16):
        keys = [by_xy[(x, y)] for y in range(16)]
        assert keys == sorted(keys)


def test_ewma_matches_python_fold(spark, sf_dir):
    """q54's higher-order-function fold must equal a plain sequential Python
    fold over the same sorted daily series — same order, same IEEE ops."""
    from librarian_spark.operators.registry import load_all

    rows = load_all()["q54_ewma"].spark_fn(spark, sf_dir).collect()
    series: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append(r)
    assert series
    for pts in series.values():
        acc = None
        for r in pts:
            acc = r.x if acc is None else 0.3 * r.x + (1 - 0.3) * acc
            assert r.ewma == round(acc, 6), (r, acc)


def test_interval_overlap_matches_brute_force(spark, sf_dir):
    """q58's sweep-line max concurrency must equal the O(n²) definition:
    for each interval, how many intervals cover some common instant —
    checked exactly by evaluating concurrency at every start point."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.sources.batch import load_table

    got = {
        r.event_type: r.max_concurrent
        for r in load_all()["q58_interval_overlap"].spark_fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", F.round(F.col("value")).cast("long").alias("rv")
    ).collect()
    from collections import defaultdict
    from datetime import timedelta

    ivs = defaultdict(list)
    for r in ev:
        ivs[r.event_type].append((r.ts, r.ts + timedelta(minutes=(r.rv % 60) + 1)))
    for et, xs in ivs.items():
        # max concurrency is attained at some interval start (half-open)
        best = 0
        starts = [s for s, _ in xs]
        for t in starts:
            best = max(best, sum(1 for s, e in xs if s <= t < e))
        assert got[et] == best, (et, got[et], best)


def test_zorder_key_exact_on_wide_domains(spark):
    """The scaling must be exact integer arithmetic: on an epoch-micros-wide
    domain, (v-lo)*(2^bits-1) exceeds 2^53 and a double-division path would
    misplace cells by one. De-interleaved cells must equal the exact
    Python-integer formula."""
    from librarian_spark.maintenance import zorder_key

    bits = 10
    lo, hi = 1_700_000_000_000_000, 1_731_536_000_000_000  # ~1y of µs
    span = hi - lo
    m = (1 << bits) - 1
    vals = [lo, hi, lo + span // 3, lo + (2**53 // m) + 12345, hi - 1]
    df = spark.createDataFrame([(v, lo) for v in vals], "x long, y long")
    out = df.select(
        "x", zorder_key(["x", "y"], [lo, lo], [hi, hi], bits=bits).alias("z")
    ).collect()
    for r in out:
        cell = sum(((r.z >> (2 * b)) & 1) << b for b in range(bits))
        exact = min(m, (r.x - lo) * m // span)
        assert cell == exact, (r.x, cell, exact)
