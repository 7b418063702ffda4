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
