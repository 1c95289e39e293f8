"""The north rule's resumability claim, tested the hard way: a real
spark-submit job killed (SIGKILL) mid-run, then re-run with the same
command — the manifest checkpoint must skip completed buckets and the final
output must have zero loss and zero duplicates."""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(out_dir: str) -> subprocess.Popen:
    from fixtures.gen_pages import ensure_pages
    from tools.package_pyfiles import main as build_zip

    src = ensure_pages("0.001")
    zip_path = build_zip()
    return subprocess.Popen(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "htmld_spark", "pipeline", "main.py"),
            "--source", src,
            "--output", out_dir,
            "--n-buckets", "8",
            "--buckets-per-round", "1",
            "--no-spans",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group → killpg nukes the JVM too
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )


def _manifest_buckets(out_dir: str) -> int:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return 0
    return sum(1 for f in os.listdir(mdir) if f.endswith(".parquet"))


def test_kill_nine_then_resume(tmp_path):
    out = str(tmp_path / "killed_job")
    proc = _submit(out)
    # wait until at least 2 rounds committed, then SIGKILL the whole job
    deadline = time.monotonic() + 300
    killed = False
    while time.monotonic() < deadline:
        n = _manifest_buckets(out)
        if 2 <= n <= 6:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break  # finished before we could kill — resume is then trivial
        time.sleep(0.3)
    proc.communicate(timeout=300)  # drain + wait (loaded host tolerance)
    progress_at_kill = _manifest_buckets(out)
    if killed:
        assert 1 <= progress_at_kill < 8, "kill landed mid-run"

    # re-run the SAME command; it must complete the remaining buckets
    proc2 = _submit(out)
    stdout, _ = proc2.communicate(timeout=300)
    assert proc2.returncode == 0, stdout
    stats = json.loads(
        [ln for ln in stdout.splitlines() if ln.startswith("{")][-1]
    )
    if killed:
        assert stats["done_at_start"] >= 1  # resumed, not restarted

    # zero loss, zero duplicates
    import duckdb

    con = duckdb.connect()
    total = con.execute(
        f"SELECT count(*), count(DISTINCT url || '|' || CAST(warc_ts AS VARCHAR)) "
        f"FROM read_parquet('{out}/data/**/*.parquet', hive_partitioning=1)"
    ).fetchone()
    assert total == (1010, 1010)
