"""North-rule execution contract: the pipeline runs under
``spark-submit --py-files a2r.zip run_pipeline.py`` with the package
importable ONLY from the zip (the cluster deployment path), not from the
repo checkout."""

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_zip(tmp_path):
    zpath = tmp_path / "a2r.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((REPO / "anything2rdf_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))

    # scratch cwd holds ONLY the entry script: imports must resolve via the zip
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    shutil.copy(REPO / "run_pipeline.py", scratch / "run_pipeline.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(scratch / "run_pipeline.py"),
            "--synth-convs", "20",
            "--warehouse", str(tmp_path / "wh"),
        ],
        cwd=str(scratch),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, (out.stderr or "")[-3000:]
    json_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, out.stdout[-2000:]
    metrics = json.loads(json_lines[-1])
    assert metrics["n_triples"] > 0
