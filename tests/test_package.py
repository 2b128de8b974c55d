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
