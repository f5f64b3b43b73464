"""C API smoke test (reference qa/TL0_abi analogue): builds the embedded-Python
C library + a pure-C client, runs a serialized pipeline through it."""

import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.slow
def test_c_api_end_to_end(tmp_path):
    capi = os.path.join(REPO, "dali_tpu", "capi")
    lib = os.path.join(capi, "libdali_tpu_c.so")
    if not os.path.exists(lib):
        subprocess.check_call([sys.executable, os.path.join(capi, "build.py")])
    exe = str(tmp_path / "test_capi")
    subprocess.check_call(
        ["gcc", "-O2", "-I", capi, os.path.join(capi, "test_capi.c"), "-o", exe,
         "-L", capi, "-ldali_tpu_c", f"-Wl,-rpath,{os.path.abspath(capi)}"]
    )
    # serialize a pipeline
    code = (
        "import jax; jax.config.update('jax_default_device', jax.devices('cpu')[0])\n"
        "from dali_tpu import pipeline_def, fn\n"
        "@pipeline_def(batch_size=4, num_threads=1, seed=3)\n"
        "def p():\n"
        "    return fn.random.uniform(range=[5.0, 6.0], shape=[3, 2]) * 2.0\n"
        "pp = p(); pp.build()\n"
        f"open({str(tmp_path / 'pipe.json')!r}, 'w').write(pp.serialize())\n"
    )
    subprocess.check_call([sys.executable, "-c", code], cwd=REPO)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.check_output([exe, str(tmp_path / "pipe.json")], env=env, text=True,
                                  stderr=subprocess.DEVNULL, timeout=240)
    assert "C API OK" in out
    assert "outputs=1 batch=4" in out
    assert "dtype=9" in out  # DALIDataType.FLOAT propagated

    # feed_input + zero-copy + checkpoint round trip on an external_source
    # pipeline (reference c_api_2 feed/checkpoint surface)
    code2 = (
        "import jax; jax.config.update('jax_default_device', jax.devices('cpu')[0])\n"
        "from dali_tpu import pipeline_def, fn\n"
        "@pipeline_def(batch_size=2, num_threads=1, seed=3)\n"
        "def p():\n"
        "    x = fn.external_source(name='src')\n"
        "    return x * 2.0\n"
        "pp = p(); pp.build()\n"
        f"open({str(tmp_path / 'pipe_feed.json')!r}, 'w').write(pp.serialize())\n"
    )
    subprocess.check_call([sys.executable, "-c", code2], cwd=REPO)
    out2 = subprocess.check_output([exe, str(tmp_path / "pipe_feed.json"), "--feed"],
                                   env=env, text=True, stderr=subprocess.DEVNULL,
                                   timeout=240)
    assert "feed+zero-copy OK" in out2
    assert "C API FEED OK" in out2

    # checkpoint-resume determinism purely through the C surface: a fresh
    # handle restored from a snapshot continues the identical RNG stream;
    # plus the error contracts (BUFFER_TOO_SMALL, INVALID_HANDLE, bad JSON)
    code3 = (
        "import jax; jax.config.update('jax_default_device', jax.devices('cpu')[0])\n"
        "from dali_tpu import pipeline_def, fn\n"
        "@pipeline_def(batch_size=3, num_threads=1, seed=7,\n"
        "              enable_checkpointing=True)\n"
        "def p():\n"
        "    u = fn.random.uniform(range=[0.0, 1.0], shape=[4, 4])\n"
        "    return u + fn.random.normal(mean=0.0, stddev=2.0, shape=[4, 4])\n"
        "pp = p(); pp.build()\n"
        f"open({str(tmp_path / 'pipe_rng.json')!r}, 'w').write(pp.serialize())\n"
    )
    subprocess.check_call([sys.executable, "-c", code3], cwd=REPO)
    out3 = subprocess.check_output([exe, str(tmp_path / "pipe_rng.json"), "--resume"],
                                   env=env, text=True, stderr=subprocess.DEVNULL,
                                   timeout=240)
    assert "identical" in out3
    assert "bad-json error" in out3
    assert "C API RESUME OK" in out3
