"""Multi-host data-parallel smoke: 2 processes x 2 CPU devices run ONE global
SSN train step; the gradient all-reduce spans processes (jax.distributed over
the Gloo backend — the DCN story of SURVEY.md §5.8 without real hosts)."""

import os
import socket
import subprocess
import sys


_WORKER_CODE = """
import jax
jax.distributed.initialize("localhost:{port}", num_processes=2, process_id={pid})
import numpy as np
from action_detection_tpu.config import SamplingConfig
from action_detection_tpu.models import SSN
from action_detection_tpu.models.backbones import get_backbone
from action_detection_tpu.parallel import make_mesh, replicate, shard_batch
from action_detection_tpu.train import make_optimizer, create_train_state, make_train_step

sampling = SamplingConfig()
model = SSN(num_class=3, base_model="TinyConv", dropout=0.0)
_, _, spec = get_backbone("TinyConv", "RGB")
B_local, P, S, H = 2, 8, 9, 32

def mk(seed):
    r = np.random.RandomState(seed)
    return {{
        "frames": r.randint(0, 256, (B_local * P, S, H, H, 3)).astype(np.uint8),
        "scaling": r.rand(B_local * P, 2).astype(np.float32),
        "labels": np.tile([1] + [2] * 6 + [0], B_local).astype(np.int64),
        "reg_targets": r.randn(B_local * P, 2).astype(np.float32),
        "prop_type": np.tile([0] + [1] * 6 + [2], B_local).astype(np.int64)}}

tx = make_optimizer(1e-3, [20], 10)
state = create_train_state(model, tx, mk(0), spec)   # same init on all procs
step = make_train_step(model, tx, sampling, spec, donate=False)
mesh = make_mesh()
gstate = replicate(state, mesh)
gbatch = shard_batch(mk(100 + {pid}), mesh)          # different data per proc
new_state, metrics = step(gstate, gbatch, jax.random.PRNGKey(0))
loss = float(metrics["loss"])                        # replicated -> readable
assert np.isfinite(loss)
print("GLOBAL_LOSS", loss, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_checkpoint_writes_guarded_by_process_zero():
    """Multi-host call discipline: every save_checkpoint call in the trainer
    CLIs must sit under an `if proc_id == 0` guard — N processes doing
    same-path os.replace on a shared filesystem can interleave tmp files."""
    import ast
    import inspect

    from action_detection_tpu.cli import binary_train, ssn_train

    def guarded_calls(module):
        tree = ast.parse(inspect.getsource(module))
        calls = []

        def visit(node, guarded):
            if isinstance(node, ast.If):
                src = ast.unparse(node.test)
                child_guarded = guarded or ("proc_id" in src and "0" in src)
                for c in ast.iter_child_nodes(node):
                    visit(c, child_guarded)
                return
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Name)
                    and node.func.id == "save_checkpoint"):
                calls.append(guarded)
            for c in ast.iter_child_nodes(node):
                visit(c, guarded)

        visit(tree, False)
        return calls

    for module in (ssn_train, binary_train):
        calls = guarded_calls(module)
        assert calls, f"no save_checkpoint call found in {module.__name__}"
        assert all(calls), (
            f"{module.__name__} has a save_checkpoint call outside the "
            f"proc_id == 0 guard")


# no pytest-timeout in this env; the communicate(timeout=220) below is the
# real guard against a hung worker
def test_two_process_data_parallel_step():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER_CODE.format(port=port, pid=pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=220)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    losses = [line.split()[1] for out in outs for line in out.splitlines()
              if line.startswith("GLOBAL_LOSS")]
    assert len(losses) == 2
    # the all-reduced loss must be identical on both processes
    assert losses[0] == losses[1], losses
