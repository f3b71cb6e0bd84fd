"""edit_distance_join vs a brute-force python Levenshtein over planted
mutations — exactness (no lost pairs, no spurious pairs, correct dist)."""

import random

import pytest
from pyspark.sql import functions as F

from seaexplorertools_spark.operators.editdist import edit_distance_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _mutate(rng, s: str, n_edits: int) -> str:
    for _ in range(n_edits):
        op = rng.choice("sid")
        pos = rng.randrange(len(s))
        c = rng.choice("abcdefgh")
        if op == "s":
            s = s[:pos] + c + s[pos + 1 :]
        elif op == "i":
            s = s[:pos] + c + s[pos:]
        elif len(s) > 8:
            s = s[:pos] + s[pos + 1 :]
    return s


@pytest.mark.parametrize("k", [1, 2, 4])
def test_edit_distance_join_exact_vs_bruteforce(spark, k):
    rng = random.Random(17)
    rows = []
    # 30 random bases, each with planted mutants at 0..k+2 edits —
    # pairs beyond k MUST be absent, pairs within k MUST all be found
    for b in range(30):
        base = "".join(rng.choice("abcdefghij") for _ in range(rng.randrange(12, 40)))
        rows.append((len(rows), base))
        for e in range(1, k + 3):
            rows.append((len(rows), _mutate(rng, base, e)))
    df = spark.createDataFrame(rows, ["id", "s"]).repartition(7)
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, "id", "s", max_dist=k).collect()
    }
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j and abs(len(a) - len(b)) <= k:
                d = _lev(a, b)
                if d <= k:
                    want[(i, j)] = d
    assert got == want
    assert want  # non-vacuous: the plant produced in-range pairs


def test_edit_distance_join_handles_short_and_equal(spark):
    df = spark.createDataFrame(
        [(0, "abcdef"), (1, "abcdef"), (2, "abcxef"), (3, "abc")], ["id", "s"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(df, "id", "s", max_dist=1).collect()
    }
    # strings of length <= k are excluded by contract (len > k required)
    assert got == {(0, 1): 0, (0, 2): 1, (1, 2): 1}
