"""Parity tests: C++ host kernels vs the numpy fallback paths."""

import numpy as np
import pytest

native = pytest.importorskip("action_detection_tpu.utils.native")

from action_detection_tpu.ops import nms as nms_mod
from action_detection_tpu.ops import tag as tag_mod


def test_native_nms_matches_numpy_fallback(monkeypatch):
    rng = np.random.RandomState(0)
    for offset in (0.0, 1.0):
        for _ in range(25):
            n = rng.randint(1, 80)
            starts = rng.rand(n) * 100
            ends = starts + rng.rand(n) * 30 + 0.1
            scores = rng.rand(n)
            got = native.nms_indices(starts, ends, scores, 0.4, offset)
            monkeypatch.setattr(nms_mod, "_native_nms", None)
            want = nms_mod.temporal_nms_indices(starts, ends, scores, 0.4,
                                                duration_offset=offset)
            monkeypatch.setattr(nms_mod, "_native_nms", native.nms_indices)
            np.testing.assert_array_equal(got, want)


def test_native_nms_tie_and_degenerate_parity(monkeypatch):
    """Tied scores follow argsort()[::-1] (larger index first) and a NaN IoU
    from degenerate zero-length boxes suppresses — both paths identical."""
    # exact duplicates -> tied scores; zero-length boxes with offset 0 -> NaN
    starts = np.array([5.0, 5.0, 5.0, 20.0, 20.0, 40.0, 60.0])
    ends = np.array([10.0, 10.0, 10.0, 20.0, 20.0, 50.0, 70.0])
    # tied scores + a NaN score (numpy sorts NaN last ascending -> visited
    # FIRST after [::-1]; both paths must agree)
    scores = np.array([0.5, 0.5, 0.5, 0.9, 0.9, 0.1, np.nan])
    for offset in (0.0, 1.0):
        got = native.nms_indices(starts, ends, scores, 0.4, offset)
        monkeypatch.setattr(nms_mod, "_native_nms", None)
        want = nms_mod.temporal_nms_indices(starts, ends, scores, 0.4,
                                            duration_offset=offset)
        monkeypatch.setattr(nms_mod, "_native_nms", native.nms_indices)
        np.testing.assert_array_equal(got, want)


def test_native_tag_search_matches_python(monkeypatch):
    rng = np.random.RandomState(1)
    for _ in range(15):
        length = rng.randint(20, 120)
        labels = (rng.rand(length) > 0.6)
        if not labels.any():
            labels[5] = True
        scores = rng.randn(length)
        tol = np.array([0.0, 0.1, 0.3, 0.7])

        monkeypatch.setattr(tag_mod, "_native_box_search", None)
        want = tag_mod.build_box_by_search([(2, labels, scores)], tol)
        monkeypatch.setattr(tag_mod, "_native_box_search", native.tag_box_search)
        got = tag_mod.build_box_by_search([(2, labels, scores)], tol)

        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[0] == w[0] and g[1] == w[1] and g[2] == w[2]
            assert abs(g[3] - w[3]) < 1e-9


def test_loader_self_builds_and_maps_failure_to_importerror(tmp_path, monkeypatch):
    """The loader must (a) build the .so itself when absent and (b) raise
    ImportError — not OSError — when the build fails, so importorskip and the
    callers' fallback guards both engage on a machine without a toolchain."""
    import importlib
    import subprocess

    mod = importlib.import_module("action_detection_tpu.utils.native")

    # (b) simulate a failed build against a missing library path
    monkeypatch.setattr(mod, "_LIB_PATH", str(tmp_path / "nothing.so"))
    monkeypatch.setattr(
        mod.subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(
            subprocess.CalledProcessError(1, a[0])))
    with pytest.raises(ImportError, match="numpy fallbacks"):
        mod._load()

    # (a) a real rebuild from scratch — in a fresh interpreter, because
    # dlopen returns this process's cached handle even if the file is gone
    monkeypatch.undo()
    import os
    import sys
    so = mod._LIB_PATH
    bak = so + ".bak"
    os.replace(so, bak)
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "from action_detection_tpu.utils import native; "
             "import numpy as np; "
             "print(native.nms_indices(np.array([0.0]), np.array([1.0]), "
             "np.array([0.5]), 0.5))"],
            capture_output=True, text=True, timeout=180)
        assert proc.returncode == 0, proc.stderr
        assert os.path.exists(so)
    finally:
        os.replace(bak, so)
