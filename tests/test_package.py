"""spark-submit --py-files packaging (tools/package.py): the zip must be a
complete deployable — every module AND the committed model artifacts —
and artifact loading must work through zipimport (a plain open() on a
path inside a zip fails; importlib.resources is the contract)."""

import subprocess
import sys
import textwrap
import zipfile

import tools.package as package


def test_zip_contains_modules_and_artifacts(tmp_path):
    out = package.main()
    names = set(zipfile.ZipFile(out).namelist())
    assert "dataquality_spark/pipeline.py" in names
    assert "dataquality_spark/models/quality.py" in names
    # the quantized quality artifact rides in the zip — without it a
    # packaged deployment cannot score the registered classifier query
    assert ("dataquality_spark/models/artifacts/quality_portable_v1.json"
            in names)
    assert not any(n.endswith(".pyc") for n in names)


def test_artifact_loads_through_zipimport():
    """Import the package FROM THE ZIP in a clean interpreter and load the
    quantized artifact with a nonexistent file path — the
    importlib.resources fallback must serve it from inside the zip."""
    package.main()
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, "dist/dataquality_spark.zip")
        import dataquality_spark.models.quality as q
        assert "dataquality_spark.zip" in q.__file__, q.__file__
        art = q.load_quantized_artifact("/nonexistent/forces/zip/path.json")
        assert len(art["wq"]) == 8192 and isinstance(art["bq"], int)
        print("ok")
    """)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-800:]


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north-rule deployment surface, literally: `spark-submit
    --py-files dist/dataquality_spark.zip run_job.py` from a cwd where the
    repo checkout is NOT importable, so the zip is the only source of the
    package (PYTHONPATH scrubbed; a bare import in the same cwd fails).
    Asserts the runner's one-line JSON contract end to end — session,
    synthetic pages, model UDFs (artifact via zipimport), checkpointed
    chunks, grade."""
    import json
    import os
    import shutil

    zip_path = package.main()
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest
        pytest.skip("spark-submit not on PATH")
    shutil.copy("/root/repo/run_job.py", tmp_path / "run_job.py")
    shutil.copy(zip_path, tmp_path / "dataquality_spark.zip")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

    probe = subprocess.run(
        [sys.executable, "-c", "import dataquality_spark"],
        capture_output=True, text=True, cwd=tmp_path, env=env, timeout=60)
    assert probe.returncode != 0, "repo leaked onto sys.path; zip not proven"

    r = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--py-files", "dataquality_spark.zip", "run_job.py",
         "--synthetic", "400", "--output", str(tmp_path / "run"),
         "--chunks", "2"],
        capture_output=True, text=True, cwd=tmp_path, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-1500:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["chunks_completed"] == [0, 1]
    assert out["rows_in"] == 400 and 0 < out["rows_kept"] <= 400
    assert out["grade"]
