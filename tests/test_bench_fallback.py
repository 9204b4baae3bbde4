"""bench.py's train-arm fallback ladder (VERDICT r4 item 2).

BENCH_r04 carried only ``train_error`` after the eq-mask pooling compile
failure — one failed compile blanked the whole training record. The ladder
(``bench.run_train_attempts``) guarantees a train number lands whenever ANY
pool path compiles, with every failed attempt recorded as a visible
regression marker. These are forced-failure tests of that driver; the
measured arms themselves run on the real TPU via bench.py.
"""
import bench


def _silent(_msg):
    pass


def test_eq_failure_falls_back_to_sas_and_records_error():
    calls = []

    def attempt(pool_path, remat):
        calls.append((pool_path, remat))
        if pool_path == "eq_mask":
            raise RuntimeError("remote_compile: HTTP 500 (forced)")
        return {"train_step_sec": 0.263, "train_images_per_sec": 4372.0}

    extras = {}
    ok = bench.run_train_attempts(attempt, "train", extras, eq_enabled=True,
                                  logf=_silent)
    assert ok
    assert calls == [("eq_mask", False), ("sas", False)]
    assert extras["train_step_sec"] == 0.263
    assert extras["train_pool_path"] == "sas"
    assert "HTTP 500" in extras["train_eq_mask_error"]
    assert "train_remat" not in extras        # no remat needed


def test_oom_falls_through_to_remat():
    def attempt(pool_path, remat):
        if not remat:
            raise RuntimeError("Ran out of memory in memory space hbm")
        return {"train_step_sec": 0.34}

    extras = {}
    ok = bench.run_train_attempts(attempt, "train", extras, eq_enabled=False,
                                  logf=_silent)
    assert ok
    assert extras["train_pool_path"] == "sas"
    assert extras["train_remat"] is True
    assert "hbm" in extras["train_sas_error"]
    assert "train_eq_mask_error" not in extras   # eq arm skipped when disabled


def test_all_attempts_failing_records_every_error():
    def attempt(pool_path, remat):
        raise RuntimeError(f"boom {pool_path} remat={remat}")

    extras = {}
    ok = bench.run_train_attempts(attempt, "train_iv3", extras,
                                  eq_enabled=True, logf=_silent)
    assert not ok
    assert set(extras) == {"train_iv3_eq_mask_error", "train_iv3_sas_error",
                           "train_iv3_sas_remat_error", "train_iv3_error"}


def test_eq_disabled_skips_eq_arm():
    calls = []

    def attempt(pool_path, remat):
        calls.append((pool_path, remat))
        return {"train_flow_step_sec": 0.3}

    extras = {}
    assert bench.run_train_attempts(attempt, "train_flow", extras,
                                    eq_enabled=False, logf=_silent)
    assert calls == [("sas", False)]
    assert extras["train_flow_pool_path"] == "sas"


def test_error_strings_are_bounded():
    def attempt(pool_path, remat):
        if pool_path == "eq_mask":
            raise RuntimeError("x" * 10_000)
        return {"train_step_sec": 0.263}

    extras = {}
    bench.run_train_attempts(attempt, "train", extras, eq_enabled=True,
                             logf=_silent)
    assert len(extras["train_eq_mask_error"]) <= 200
