"""Watch-mode bench (VERDICT r4 'Next' #7): one BOOTSTRAP wave + one
INCREMENTAL wave + one idle poll over the bench corpus, through the
same ``watch_once`` surface the ``twine-ray watch`` CLI drives.

Shards are symlinked into the watch directory (zero copy); wave 2 is
the corpus' last ~1/16 of shard files.  Prints ONE JSON line with the
per-wave walls and the incremental wave's changed-bucket metrics.

Usage: ``python tools/bench_watch.py [--pages N]`` (default
BENCH_PAGES or 2,400,000; RAY_GRAFT_CPUS controls the session size —
bench.py's protocol).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> dict:
    import ray

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench as _bench  # noqa: E402  (repo-root bench harness)

    n_pages = int(os.environ.get("BENCH_PAGES", "2400000"))
    if "--pages" in sys.argv:
        n_pages = int(sys.argv[sys.argv.index("--pages") + 1])

    _bench._init_ray(NUM_CPUS)
    corpus = _bench.ensure_bench_corpus(n_pages)
    shards = sorted(
        f for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    wave2_n = max(1, len(shards) // 16)
    wave1, wave2 = shards[:-wave2_n], shards[-wave2_n:]

    root = f"/tmp/bench_watch_{n_pages}"
    shutil.rmtree(root, ignore_errors=True)
    watch_dir = os.path.join(root, "incoming")
    out_dir = os.path.join(root, "kg")
    os.makedirs(watch_dir)

    from twine_ray.pipelines.kg import default_alias_rows
    from twine_ray.pipelines.watch import watch_once

    aliases = default_alias_rows()
    conc = max(2, NUM_CPUS // 2)

    def _link(names):
        for s in names:
            os.symlink(os.path.join(corpus, s),
                       os.path.join(watch_dir, s))

    out: dict = {
        "metric": "watch_bench", "pages": n_pages,
        "num_cpus": NUM_CPUS, "shards": len(shards),
        "wave1_shards": len(wave1), "wave2_shards": len(wave2),
        "load_at_start": round(os.getloadavg()[0], 2),
    }

    _link(wave1)
    t0 = time.perf_counter()
    r1 = watch_once(watch_dir, out_dir, aliases,
                    num_buckets=32, concurrency=conc)
    out["bootstrap_sec"] = round(time.perf_counter() - t0, 2)
    out["bootstrap_mode"] = r1["mode"]

    _link(wave2)
    t0 = time.perf_counter()
    r2 = watch_once(watch_dir, out_dir, aliases, concurrency=conc)
    out["incremental_sec"] = round(time.perf_counter() - t0, 2)
    out["incremental_mode"] = r2["mode"]
    out["incremental_metrics"] = {
        k: v for k, v in r2["metrics"].items()
        if isinstance(v, (int, float))
    }

    t0 = time.perf_counter()
    r3 = watch_once(watch_dir, out_dir, aliases, concurrency=conc)
    out["idle_poll_sec"] = round(time.perf_counter() - t0, 3)
    out["idle_is_noop"] = r3 is None

    print(json.dumps(out), flush=True)
    ray.shutdown()
    return out


if __name__ == "__main__":
    main()
