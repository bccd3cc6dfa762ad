"""North-rule launch shape, end-to-end: `spark-submit --py-files
dist/crawler_spark.zip cli.py ...` run as a real subprocess from a cwd
OUTSIDE the repo with the repo stripped from PYTHONPATH, so every
crawler_spark import must resolve from the zip — the exact artifact a
multi-executor cluster submission ships. Asserts the crawl loop boots,
commits a batch, and reports its snapshot id."""

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_launch(tmp_path):
    # build the submission artifact with the real packer
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("crawler_spark.zip") and os.path.exists(zip_path)

    # the app file is shipped separately from the --py-files zip, exactly
    # like a cluster submission; run it from a neutral cwd
    app = str(tmp_path / "cli.py")
    shutil.copyfile(os.path.join(REPO, "cli.py"), app)
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # crawler_spark must come from the zip
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_MASTER"] = "local[2]"
    env["SPARK_GRAFT_CPUS"] = "2"

    root = str(tmp_path / "store")
    r = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--py-files", zip_path, app,
            "--root", root, "--batches", "1",
            "--universe", "200", "--seeds", "4", "--no-sketch",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()
             if x.startswith("{")]
    assert lines, r.stdout[-2000:]
    assert lines[-1]["snapshot_id"] >= 1
    batch = lines[0]
    assert batch.get("fetched_ok", 0) > 0
    # the store really exists where the CLI was pointed
    assert os.path.isdir(root)
