"""pbcompat + tws runtime availability (VERDICT r10 #7).

The "Done" criterion for the r10 advice was ``tws_runtime_available()[0]
is True`` in CI — through r10 the broken-protobuf container forced the
gated path; the pbcompat shim (vendored pure-Python protobuf runtime,
linked read-only from the local Google Cloud SDK) now makes the state
protocol importable, and tests/test_streaming.py runs the
transformWithState batch-equality for real. This module pins the shim
itself so a regression reverts to an actionable gate, not a silent skip.
"""

from __future__ import annotations

from distributed_system_mapreduce_spark.pbcompat import ensure_protobuf


def test_ensure_protobuf_makes_runtime_importable():
    ok, detail = ensure_protobuf()
    assert ok, detail
    from google.protobuf import descriptor  # noqa: F401


def test_ensure_protobuf_is_idempotent_and_memoized():
    assert ensure_protobuf() == ensure_protobuf()


def test_tws_runtime_available_here(spark):
    """The full probe — protobuf runtime AND the generated state-protocol
    messages (which run gencode/runtime version validation) — must pass
    on this container now that the shim links the vendored runtime."""
    from distributed_system_mapreduce_spark.streaming import (
        tws_runtime_available,
    )

    ok, reason = tws_runtime_available()
    assert ok, reason


def test_shim_dir_is_per_user_and_stale_links_are_repaired(tmp_path):
    """ADVICE r11: the shim dir must be per-user (mode 0700, ownership
    checked) and a pre-existing symlink pointing anywhere but the vendored
    source must be recreated, never silently reused. Runs in a clean
    subprocess (the in-process result is memoized and the shim already
    sits on sys.path here)."""
    import os
    import subprocess
    import sys
    import tempfile

    shim = os.path.join(
        tempfile.gettempdir(), f"dsmr_pbshim_{os.getuid()}"
    )
    gdir = os.path.join(shim, "google")
    link = os.path.join(gdir, "protobuf")
    os.makedirs(gdir, exist_ok=True)
    # plant a stale link (simulates a moved/removed SDK or tampering)
    stale_target = str(tmp_path / "nowhere")
    if os.path.lexists(link):
        os.unlink(link)
    os.symlink(stale_target, link)

    code = (
        "import os\n"
        "from distributed_system_mapreduce_spark.pbcompat import "
        "ensure_protobuf, _VENDORED_PROTOBUF_DIRS\n"
        "ok, detail = ensure_protobuf()\n"
        f"link = {link!r}\n"
        "assert ok, detail\n"
        "assert os.readlink(link) in _VENDORED_PROTOBUF_DIRS, "
        "os.readlink(link)\n"
        "st = os.stat(os.path.dirname(os.path.dirname(link)))\n"
        "assert st.st_uid == os.getuid()\n"
        "assert (st.st_mode & 0o077) == 0, oct(st.st_mode)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr


def test_shimless_environment_warns_loudly():
    """VERDICT r14 #7: when no protobuf runtime exists and no vendored
    copy can be linked, ensure_protobuf must emit ONE ProtobufShimWarning
    (and only one — the result is memoized) so the degraded
    transformWithState surface is visible in logs instead of silently
    turning into skips. Runs in a clean subprocess with the vendored-dir
    probe list emptied to simulate the shim-less environment."""
    import os
    import subprocess
    import sys

    code = (
        "import warnings\n"
        "import distributed_system_mapreduce_spark.pbcompat as pb\n"
        "pb._VENDORED_PROTOBUF_DIRS = ()\n"
        "import sys\n"
        # hide any native install from the probe
        "import builtins\n"
        "real_import = builtins.__import__\n"
        "def block(name, *a, **k):\n"
        "    if name.startswith('google'):\n"
        "        raise ImportError('blocked for test')\n"
        "    return real_import(name, *a, **k)\n"
        "builtins.__import__ = block\n"
        "with warnings.catch_warnings(record=True) as w:\n"
        "    warnings.simplefilter('always')\n"
        "    ok1, detail1 = pb.ensure_protobuf()\n"
        "    ok2, _ = pb.ensure_protobuf()\n"
        "assert not ok1 and not ok2, (ok1, ok2, detail1)\n"
        "shim_warns = [x for x in w "
        "if issubclass(x.category, pb.ProtobufShimWarning)]\n"
        "assert len(shim_warns) == 1, [str(x.message) for x in w]\n"
        "assert 'degraded' in str(shim_warns[0].message)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
