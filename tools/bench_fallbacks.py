"""Entity-scale evidence for the forced-distributed fallback paths
(VERDICT r3 "Next round" #7).

Every driver-side collect in the engine sits behind a size valve with
a distributed fallback (CANON/DUP/SEMDEDUP/BROADCAST_ID limits).  The
fallbacks are tested EQUAL at toy scale; this harness times each one
at bench scale with the valve forced, next to its broadcast/driver
twin, proving the fallbacks are usable — not just correct — when a
100 TB corpus trips them.  Results go into BENCH/BASELINE.md.

Paths measured (pages corpus = the 2.4M-page scaling-leg corpus by
default; BENCH_PAGES overrides):

- A1 connected components: driver DSU vs forced label propagation +
  pointer jumping (stages/canon.py)
- J2 canon rewrite: broadcast map vs forced distributed hash join
  (stages/resolve.py rewrite_canon_auto(force_shuffle=True))
- graph-replace: dup-slice broadcast split vs forced full-shuffle
  latest-wins (stages/extract.py, DUP_BROADCAST_LIMIT = -1)
- MinHash dedup + SemDeDup: broadcast id-set vs forced distributed
  join/anti-join (documents/embeddings tables at $GRAFT_SF_DIR)

Usage: python tools/bench_fallbacks.py [--pages N]  (prints one JSON
line; ~15 min at 2.4M pages / 32 CPUs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from twine_ray.state.malloctune import reexec_tuned  # noqa: E402

reexec_tuned()

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _t(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main() -> dict:
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as _bench  # noqa: E402  (repo-root bench harness)

    n_pages = int(os.environ.get("BENCH_PAGES", "2400000"))
    if "--pages" in sys.argv:
        n_pages = int(sys.argv[sys.argv.index("--pages") + 1])

    _bench._init_ray(NUM_CPUS)
    corpus = _bench.ensure_bench_corpus(n_pages)

    import ray.data as rd

    from twine_ray.pipelines.kg import _phase1, default_alias_rows
    from twine_ray.pipelines.kg import sameas_edges
    from twine_ray.stages.canon import connected_components
    from twine_ray.stages.materialize import read_triple_store
    from twine_ray.stages.resolve import rewrite_canon_auto

    out: dict = {"pages": n_pages, "num_cpus": NUM_CPUS, "sf": SF_DIR}

    # phase 1 once (resumable dir, reused across invocations)
    raw_dir = f"/tmp/bench_fallbacks_raw_{n_pages}"
    pages = rd.read_parquet(corpus)
    sec, _ = _t(lambda: _phase1(
        pages, raw_dir, default_alias_rows(), 32,
        max(2, NUM_CPUS // 2), resume=True,
    ))
    out["phase1_sec"] = sec

    raw_ds = read_triple_store(raw_dir).drop_columns(["graph_bucket"])
    edges = sameas_edges(raw_ds).materialize()
    out["edges"] = edges.count()

    sec, cc_dsu = _t(lambda: connected_components(edges).materialize())
    out["cc_driver_dsu_sec"] = sec
    sec, cc_lp = _t(lambda: connected_components(
        edges, force_distributed=True
    ).materialize())
    out["cc_label_prop_sec"] = sec
    out["cc_rows_equal"] = cc_dsu.count() == cc_lp.count()

    canon_ds = cc_dsu
    sec, (rw_b, _rows) = _t(
        lambda: rewrite_canon_auto(raw_ds, canon_ds)
    )
    sec2, n_b = _t(lambda: rw_b.count())
    out["rewrite_broadcast_sec"] = round(sec + sec2, 3)
    sec, (rw_s, _none) = _t(
        lambda: rewrite_canon_auto(raw_ds, canon_ds, force_shuffle=True)
    )
    sec2, n_s = _t(lambda: rw_s.count())
    out["rewrite_shuffle_sec"] = round(sec + sec2, 3)
    out["rewrite_rows_equal"] = n_b == n_s

    # graph-replace: broadcast dup-split vs forced full shuffle
    from twine_ray.stages import extract as _ex

    sec, n1 = _t(
        lambda: _ex.extract_with_graph_replace(pages).count()
    )
    out["graph_replace_broadcast_sec"] = sec
    old = _ex.DUP_BROADCAST_LIMIT
    _ex.DUP_BROADCAST_LIMIT = -1  # force the full-shuffle route
    try:
        sec, n2 = _t(
            lambda: _ex.extract_with_graph_replace(pages).count()
        )
    finally:
        _ex.DUP_BROADCAST_LIMIT = old
    out["graph_replace_shuffle_sec"] = sec
    out["graph_replace_rows_equal"] = n1 == n2

    # dedup/semdedup distributed fallbacks over the sf tables
    from twine_ray.pipelines import cluster as _cl
    from twine_ray.pipelines import dedup as _dd

    sec, nb = _t(lambda: _dd.q_dedup_minhash(SF_DIR).count())
    out["minhash_broadcast_sec"] = sec
    old = _dd.BROADCAST_ID_LIMIT
    _dd.BROADCAST_ID_LIMIT = -1
    try:
        sec, ns = _t(lambda: _dd.q_dedup_minhash(SF_DIR).count())
    finally:
        _dd.BROADCAST_ID_LIMIT = old
    out["minhash_distributed_sec"] = sec
    out["minhash_rows_equal"] = nb == ns

    sec, nb = _t(lambda: _cl.q_embed_semdedup(SF_DIR).count())
    out["semdedup_broadcast_sec"] = sec
    old = _cl.SEMDEDUP_BROADCAST_LIMIT
    _cl.SEMDEDUP_BROADCAST_LIMIT = -1
    try:
        sec, ns = _t(lambda: _cl.q_embed_semdedup(SF_DIR).count())
    finally:
        _cl.SEMDEDUP_BROADCAST_LIMIT = old
    out["semdedup_antijoin_sec"] = sec
    out["semdedup_rows_equal"] = nb == ns

    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
