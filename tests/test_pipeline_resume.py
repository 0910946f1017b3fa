"""Pipeline-level kill-and-resume e2e (round 6, VERDICT r5 task 6):
streaming has resume tests and extraction has `run_partitioned`
resume, but the near-dup stage (components loop under
--checkpoint-dir) had never been killed mid-iteration and restarted.

Protocol: run the pipeline job as a subprocess, SIGKILL it the moment
the reliable checkpoint directory receives its first content (the
components loop's first lineage cut -- i.e. mid-stage-4, after the
stage-1 bucket markers are committed), then re-run the identical
command.  The second run must resume stage 1 from the committed
buckets (buckets_run == 0) and produce a keep-set identical to an
uninterrupted reference run."""

import json
import os
import signal
import subprocess
import sys
import time

import duckdb


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "run_pipeline.py")
N_SYNTH = 400


def _cmd(out_dir, ckpt_dir):
    return [
        sys.executable, JOB,
        "--synth", str(N_SYNTH),
        "--output", out_dir,
        "--buckets", "8",
        "--checkpoint-dir", ckpt_dir,
    ]


def _env():
    # plain `python jobs/run_pipeline.py` (no spark-submit --py-files
    # here -- the verify harness covers deployment): the package must
    # be importable by driver AND python workers
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run(cmd):
    return subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=900,
        env=_env(),
    )


def _summary(proc):
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no summary JSON in stdout; stderr tail: {proc.stderr[-2000:]}"
    return json.loads(lines[-1])


def _keep_set(out_dir):
    con = duckdb.connect()
    rows = con.sql(
        "SELECT doc_id FROM "
        f"read_parquet('{out_dir}/training/**/*.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


def _dir_has_content(d):
    for _, _, files in os.walk(d):
        if files:
            return True
    return False


def test_near_dup_stage_kill_and_resume(tmp_path_factory):
    base = tmp_path_factory.mktemp("ppl_resume")
    ref_out = str(base / "ref_out")
    out = str(base / "out")
    ckpt_ref = str(base / "ckpt_ref")
    ckpt = str(base / "ckpt")

    # reference: uninterrupted run
    ref = _run(_cmd(ref_out, ckpt_ref))
    assert ref.returncode == 0, ref.stderr[-2000:]
    ref_summary = _summary(ref)
    ref_keep = _keep_set(ref_out)
    assert ref_summary["kept"] == len(ref_keep)

    # run 1: kill the instant the checkpoint dir gets content (the
    # components loop's first reliable lineage cut = mid-stage-4)
    proc = subprocess.Popen(
        _cmd(out, ckpt), cwd=REPO, env=_env(),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    deadline = time.time() + 600
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill -- handled below
        if _dir_has_content(ckpt):
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.2)
    proc.wait(timeout=60)
    assert killed, (
        "pipeline finished before the components loop checkpointed; "
        "increase N_SYNTH to keep the kill window open"
    )
    # the kill must land after stage 1 committed its buckets...
    metrics = os.path.join(out, "extract", "metrics")
    committed = [
        d for d in (os.listdir(metrics) if os.path.isdir(metrics) else [])
        if d.startswith("partition_id=")
    ]
    assert len(committed) == 8, committed
    # ...and before the final output landed
    assert not os.path.isdir(os.path.join(out, "training")) or not _keep_set(
        out
    ) == ref_keep or proc.returncode != 0

    # run 2: identical command resumes -- stage 1 skips all buckets,
    # stage 4 re-runs from the committed extraction, output identical
    res = _run(_cmd(out, ckpt))
    assert res.returncode == 0, res.stderr[-2000:]
    summary = _summary(res)
    assert summary["buckets_run"] == 0
    assert summary["buckets_skipped"] == 8
    assert summary["extracted"] == ref_summary["extracted"]
    assert summary["exact_kept"] == ref_summary["exact_kept"]
    assert summary["kept"] == ref_summary["kept"]
    assert _keep_set(out) == ref_keep
