"""dedup_semantic (SemDeDup-style cluster-then-cosine dedup).

The oracle differential pins the full operator against DuckDB; these
tests pin the SEMANTICS against an independent pure-numpy model of the
greedy within-cluster drop rule, plus the two structural invariants any
keep-mask consumer relies on: full corpus coverage (exactly one row per
vector, is_kept boolean) and the anchor law (the lowest vec_id of every
cluster is always kept — it can have no lower-id neighbor).
"""

from __future__ import annotations

import numpy as np

from zylyty_data_engineer_challenge_spark.operators.cluster import kmeans_lloyd
from zylyty_data_engineer_challenge_spark.operators.dedup import (
    COS_DEN,
    COS_NUM,
    dedup_semantic,
)
from zylyty_data_engineer_challenge_spark.operators.similarity import _quantized


def test_semantic_matches_numpy_model(spark, sf_dir):
    out = {
        int(r["vec_id"]): (int(r["cid"]), int(r["is_kept"]))
        for r in dedup_semantic(spark, sf_dir).collect()
    }
    labels = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_lloyd(spark, sf_dir).collect()
    }
    vecs = {
        int(r["vec_id"]): np.asarray(r["q"], dtype=np.int64)
        for r in _quantized(spark, sf_dir).collect()
    }

    assert set(out) == set(vecs), "one row per embedding vector"
    assert {cid for cid, _ in out.values()} == set(labels.values())

    # independent greedy model: drop v iff a lower-id same-cluster
    # neighbor passes the exact integer cosine test
    for v, (cid, kept) in out.items():
        assert cid == labels[v], "cid must be the Lloyd assignment"
        qv, nv = vecs[v], int(vecs[v] @ vecs[v])
        has_lower_neighbor = False
        for u, cu in labels.items():
            if u >= v or cu != cid:
                continue
            dot = int(vecs[u] @ qv)
            nu = int(vecs[u] @ vecs[u])
            if dot > 0 and COS_DEN * dot * dot >= COS_NUM * nu * nv:
                has_lower_neighbor = True
                break
        assert kept == (0 if has_lower_neighbor else 1), f"vec {v}"


def test_semantic_cluster_anchors_always_kept(spark, sf_dir):
    rows = dedup_semantic(spark, sf_dir).collect()
    assert all(r["is_kept"] in (0, 1) for r in rows)
    anchors = {}
    for r in rows:
        cid = int(r["cid"])
        if cid not in anchors or r["vec_id"] < anchors[cid]["vec_id"]:
            anchors[cid] = r
    assert anchors, "at least one cluster"
    assert all(a["is_kept"] == 1 for a in anchors.values())


# ---------------------------------------------------------------------------
# Mega-cluster cap (r11): bounded tasks, blocking-invariant mask
# ---------------------------------------------------------------------------

_MEGA_N = 480
_MEGA_DIMS = 8


def _mega_members(spark):
    """Synthetic skewed corpus: ONE cluster holds 80% of the vectors (the
    SemDeDup failure mode the cap exists for). Vectors come from a few
    base directions with deterministic perturbation so the integer
    cosine test fires on a real subset of pairs."""
    rows = []
    for i in range(_MEGA_N):
        cid = 0 if i % 5 != 4 else (i % 3 + 1)  # 80% in cluster 0
        base = i % 7
        q = [
            (1000 if d == base % _MEGA_DIMS else 0)
            + ((i * 37 + d * 11) % 21 - 10)
            for d in range(_MEGA_DIMS)
        ]
        n = sum(x * x for x in q)
        rows.append((i, cid, q, n))
    return spark.createDataFrame(
        rows, "vec_id bigint, cid int, q array<bigint>, n bigint"
    )


def _model_dropped(rows):
    """Independent pure-python O(n^2) drop set."""
    import numpy as np

    by_cid = {}
    for vid, cid, q, _n in rows:
        by_cid.setdefault(cid, []).append((vid, np.asarray(q, dtype=np.int64)))
    dropped = set()
    for members in by_cid.values():
        members.sort()
        for j, (vj, qj) in enumerate(members):
            nj = int(qj @ qj)
            for vi, qi in members[:j]:
                dot = int(qi @ qj)
                ni = int(qi @ qi)
                if dot > 0 and COS_DEN * dot * dot >= COS_NUM * ni * nj:
                    dropped.add(vj)
                    break
    return dropped


def test_semantic_pair_tasks_are_bounded_and_cover_all_block_pairs(spark):
    """The bounded-task contract: with a cap far below the mega-cluster's
    size, no task may hold more than two blocks' worth of rows (the
    straggler/OOM guard), and the mega cluster must decompose into
    exactly nb*(nb+1)/2 block-pair tasks."""
    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        _semantic_pair_tasks,
    )

    cap = 64
    members = _mega_members(spark)
    tasks = _semantic_pair_tasks(members, cap=cap).collect()
    mega_size = sum(1 for r in tasks if r["cid"] == 0 and r["bi"] == r["bj"] == 0)
    by_task = {}
    for r in tasks:
        by_task.setdefault((r["cid"], r["bi"], r["bj"]), []).append(r)
    # hard bound: a task never exceeds two hash-balanced blocks + slack
    assert max(len(v) for v in by_task.values()) <= 3 * cap
    # the mega cluster (384 members, cap 64 -> nb=6) covers all 21 pairs
    import math

    n_mega = 384
    nb = math.ceil(n_mega / cap)
    mega_tasks = [k for k in by_task if k[0] == 0]
    assert len(mega_tasks) == nb * (nb + 1) // 2
    assert sorted(mega_tasks) == [
        (0, i, j) for i in range(nb) for j in range(i, nb)
    ]
    # every member appears exactly nb times in its cluster's tasks
    from collections import Counter

    per_vec = Counter(r["vec_id"] for r in tasks if r["cid"] == 0)
    assert set(per_vec.values()) == {nb}


def test_semantic_dropped_is_blocking_invariant_and_matches_model(spark):
    """The keep-mask must be identical whether the mega cluster runs as
    one task (huge cap) or as 21 bounded block-pair tasks (small cap),
    and both must equal the independent O(n^2) python model."""
    from zylyty_data_engineer_challenge_spark.operators.dedup import (
        _semantic_dropped,
    )

    members = _mega_members(spark)
    rows = [(r["vec_id"], r["cid"], list(r["q"]), r["n"]) for r in members.collect()]
    want = _model_dropped(rows)
    assert want, "synthetic corpus must produce a nonempty drop set"
    capped = {r["vec_id"] for r in _semantic_dropped(members, cap=64).collect()}
    single = {
        r["vec_id"] for r in _semantic_dropped(members, cap=10**9).collect()
    }
    assert capped == single == want
