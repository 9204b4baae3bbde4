"""Checkpoint save/restore carrying regression-target statistics.

Behavioral parity target: /root/reference/ssn_train.py:160-169,365-370 —
checkpoints bundle {epoch, arch, weights, best_loss, reg_stats}; the
regression normalization stats MUST ride along because inference denormalizes
regression outputs with them (ssn_test.py:89-92). Serialization is flax
msgpack (pure bytes, no pickle of arbitrary objects).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def checkpoint_name(snapshot_pref: str, dataset: str, arch: str, modality: str,
                    filename: str = "checkpoint.msgpack") -> str:
    """ssn_<pref>_<dataset>_<arch>_<modality>_checkpoint.* naming scheme."""
    return "ssn" + "_".join((snapshot_pref, dataset, arch, modality.lower(),
                             filename))


def save_checkpoint(path: str, params: Any, reg_stats: np.ndarray,
                    batch_stats: Any = None, epoch: int = 0, arch: str = "",
                    best_loss: float = float("inf"), is_best: bool = False,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    state = {
        "epoch": np.int64(epoch),
        "arch": arch,
        "best_loss": np.float64(best_loss),
        "reg_stats": np.asarray(reg_stats),
        "params": params,
        "batch_stats": batch_stats if batch_stats is not None else {},
        "extra": extra or {},
    }
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if is_best:
        head, tail = os.path.split(path)
        if "checkpoint" in tail:
            best = tail.replace("checkpoint", "model_best")
        else:  # arbitrary filename: suffix instead of a same-file copy
            root, ext = os.path.splitext(tail)
            best = root + "_model_best" + ext
        shutil.copyfile(path, os.path.join(head, best))


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint dict: params/batch_stats come back as nested dicts of
    numpy arrays (feed to ``model.apply`` directly)."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.msgpack_restore(blob)


def save_checkpoint_orbax(directory: str, params: Any, reg_stats: np.ndarray,
                          batch_stats: Any = None, epoch: int = 0,
                          arch: str = "", best_loss: float = float("inf")) -> None:
    """Orbax backend for large-scale / sharded training state.

    Writes the same logical contents as :func:`save_checkpoint` into an orbax
    directory (atomic, sharding-aware, suitable for multi-host jobs where
    every process participates in the save).
    """
    import orbax.checkpoint as ocp

    state = {
        "epoch": np.int64(epoch),
        "best_loss": np.float64(best_loss),
        "reg_stats": np.asarray(reg_stats),
        "params": serialization.to_state_dict(params),
        "batch_stats": serialization.to_state_dict(
            batch_stats if batch_stats is not None else {}),
    }
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(os.path.abspath(directory) + ".tmp_ocp", state, force=True)
    checkpointer.wait_until_finished()
    if os.path.exists(directory):
        shutil.rmtree(directory)
    os.replace(os.path.abspath(directory) + ".tmp_ocp", directory)
    # arch is a string (not an array leaf); ride it in a sidecar
    with open(os.path.join(directory, "ARCH"), "w") as f:
        f.write(arch)


def load_checkpoint_orbax(directory: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    state = checkpointer.restore(os.path.abspath(directory))
    arch_file = os.path.join(directory, "ARCH")
    arch = open(arch_file).read() if os.path.exists(arch_file) else ""
    return {"epoch": int(state["epoch"]), "arch": arch,
            "best_loss": float(state["best_loss"]),
            "reg_stats": np.asarray(state["reg_stats"]),
            "params": state["params"], "batch_stats": state["batch_stats"],
            "extra": {}}
