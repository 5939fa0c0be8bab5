"""Session-19 operator against a pure-Python recount:

- q196 ANN hubness audit: exact float kNN recount (numpy cosines, same
  double arithmetic) -> k-occurrence census -> expectation/flag
  arithmetic, plus discrimination pins (hubs AND antihubs exist, census
  mass conservation: sum of N_k = k x |queries|).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SF = "/root/testdata/sf0.001"
K, QMOD = 10, 5


def _py_hubness():
    tbl = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    ids = tbl["vec_id"]
    vecs = {i: np.array(v, dtype=np.float64) for i, v in zip(ids, tbl["embedding"])}
    n = len(ids)
    nq = sum(1 for i in ids if i % QMOD == 0)
    occ = {i: 0 for i in ids}
    for q in ids:
        if q % QMOD != 0:
            continue
        qv = vecs[q]
        qn = float(qv @ qv)
        scored = []
        for c in ids:
            if c == q:
                continue
            cv = vecs[c]
            cos = float(qv @ cv) / float(np.sqrt(qn * float(cv @ cv)))
            scored.append((-cos, c))
        scored.sort()
        for _neg, c in scored[:K]:
            occ[c] += 1
    out = {}
    for i in ids:
        nk = occ[i]
        out[i] = (
            nk,
            (1000 * K * nq) // (n - 1),
            (n - 1) * nk >= 2 * K * nq,
            nk == 0,
        )
    return out, n, nq


def test_q196_matches_bruteforce(spark):
    from webscraping_video_pipeline_spark.contract.similarity import (
        q196_ann_hubness_audit,
    )

    want, n, nq = _py_hubness()
    got = {
        r.vec_id: (r.n_k, r.expected_nk_milli, r.is_hub, r.is_antihub)
        for r in q196_ann_hubness_audit(spark, SF).collect()
    }
    assert got == want
    # census mass conservation: every query contributed exactly k slots
    assert sum(v[0] for v in got.values()) == K * nq
    # the fixture's embedding space exhibits the pathology the audit
    # exists to catch: both hubs and antihubs present
    assert any(v[2] for v in got.values())
    assert any(v[3] for v in got.values())
    assert len(got) == n
