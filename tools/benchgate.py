"""Bench regression gate: A/B the working tree against HEAD on the same
box and fail when a query regresses past tolerance.

Round 7 shipped a persist-layout change that regressed the two heaviest
queries +73%/+69% because nothing in the pre-commit flow measured them;
this gate makes that class of change fail loudly before it lands.

Usage:
    python tools/benchgate.py q1 q2 ...       # gate these queries
    python tools/benchgate.py                 # gate every bench headline

Both sides run in their own fresh subprocess + SparkSession with
bench.py's methodology (one cold pass, best-of-5 steady state, no cache
release between passes): the BASELINE side imports the package from a
temporary `git worktree` of HEAD, the CANDIDATE side from the working
tree. Because the two measurements share the box, the session freshness,
and the minute, global drift cancels — comparing against a *recorded*
round bench does not work here: whole-board drift of 2x between sessions
on this shared 32-thread host swamps any tolerance that would still
catch a real 50% regression (measured while building this gate).

Exit 0 = every gated query's candidate/baseline ratio <= 1 + tolerance
(20%; 50% under 1 s, where single-session A/B noise on the ~0.2 s/job
scheduling floor runs +-40% even on identical code - measured while
building this gate; the regressions the gate exists for are the
data-heavy multi-second ones).
Exit 1 = at least one regressed; each is printed. Runs at sf0.1 like the
driver ($SPARK_GRAFT_SF_DIR overrides).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root bench.py: HEADLINE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = r"""
import json, os, sys, time
root = sys.argv[1]
names = sys.argv[2:]
sys.path.insert(0, root)
os.environ["PYTHONPATH"] = root + os.pathsep + os.environ.get("PYTHONPATH", "")
from sids_data_pipeline_spark.plans.catalog import all_queries
from sids_data_pipeline_spark.session import get_spark
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("benchgate_child")
catalog = all_queries()
out = {}
for name in names:
    fn = catalog[name].spark
    fn(spark, sf).count()  # cold
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        fn(spark, sf).count()
        best = min(best, time.time() - t0)
    out[name] = round(best, 3)
spark.stop()
print("BENCHGATE_JSON:" + json.dumps(out))
"""


def _measure(root: str, names: list[str]) -> dict[str, float]:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, root, *names],
        capture_output=True, text=True, cwd=root,
    )
    for line in p.stdout.splitlines():
        if line.startswith("BENCHGATE_JSON:"):
            return json.loads(line[len("BENCHGATE_JSON:"):])
    raise RuntimeError(
        f"benchgate child in {root} produced no result:\n{p.stderr[-2000:]}"
    )


def main() -> int:
    names = sys.argv[1:] or list(bench.HEADLINE)
    base_dir = tempfile.mkdtemp(prefix="benchgate_head_")
    # inside a pre-commit hook git exports GIT_INDEX_FILE (a temp index)
    # and friends; inheriting them breaks `git worktree add` in a
    # different checkout — strip all GIT_* for the sub-invocations
    git_env = {k: v for k, v in os.environ.items() if not k.startswith("GIT_")}
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", "--force", base_dir, "HEAD"],
            cwd=REPO, check=True, capture_output=True, env=git_env,
        )
    except subprocess.CalledProcessError as ex:
        print(f"benchgate: cannot create HEAD worktree ({ex.stderr}), "
              "skipping gate", file=sys.stderr)
        return 0
    # Candidate side: in a pre-commit hook the thing being gated is the
    # STAGED INDEX, which can differ from the working tree (partial
    # staging, post-stage experiments). git exports GIT_INDEX_FILE in
    # hooks; `git checkout-index` with that env intact exports exactly
    # the staged snapshot. Manual runs gate the working tree.
    cand_dir = None
    if "GIT_INDEX_FILE" in os.environ:
        cand_dir = tempfile.mkdtemp(prefix="benchgate_index_")
        subprocess.run(
            ["git", "checkout-index", "-a", f"--prefix={cand_dir}/"],
            cwd=REPO, check=True, capture_output=True,
        )
    try:
        base = _measure(base_dir, names)
        cand = _measure(cand_dir or REPO, names)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", base_dir],
            cwd=REPO, capture_output=True, env=git_env,
        )
        if cand_dir is not None:
            import shutil

            shutil.rmtree(cand_dir, ignore_errors=True)
    failures = []
    results = {}
    for name in names:
        b, c = base.get(name), cand.get(name)
        if b is None or c is None:
            continue
        tol = 0.50 if b < 1.0 else 0.20
        results[name] = {"head": b, "staged": c,
                         "ratio": round(c / b, 3) if b else None}
        if c > b * (1.0 + tol):
            failures.append(
                f"{name}: {c:.3f}s vs HEAD {b:.3f}s "
                f"(+{(c / b - 1) * 100:.0f}% > {tol * 100:.0f}% tolerance)"
            )
    print(json.dumps({"baseline": "HEAD", "results": results,
                      "failures": failures}))
    for f in failures:
        print(f"benchgate FAIL {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
