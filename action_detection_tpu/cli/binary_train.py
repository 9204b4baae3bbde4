"""Binary actionness training CLI (parity target: /root/reference/binary_train.py).

Trains the TAG fg/bg classifier: batches of 4 videos x 12 proposals x 5
course segments, plain cross-entropy.
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from .opts import build_train_parser

    parser = build_train_parser("Train binary actionness classifier (TPU-native)")
    parser.set_defaults(batch_size=4)
    args = parser.parse_args(argv)

    import jax

    # join the multi-host job before any other jax call (no-op single host;
    # the mesh below spans all global devices)
    from ..parallel import initialize_multihost

    initialize_multihost(args.coordinator_address, args.num_processes,
                         args.process_id)
    import jax.numpy as jnp
    import optax

    from ..config import get_actionness_configs
    from ..data.binary_dataset import BinaryDataset
    from ..data.pipeline import (DirectoryFrameProvider, PrefetchLoader,
                                 SyntheticFrameProvider, load_proposal_frames)
    from ..data.transforms import Stack, get_train_augmentation, preprocess_frames
    from ..models import BinaryClassifier
    from ..models.backbones import get_backbone
    from ..ops.losses import accuracy
    from ..parallel import make_mesh, replicate, select_devices, shard_batch
    from ..train import (checkpoint_name, load_checkpoint, make_optimizer,
                         save_checkpoint)
    from ..train.trainer import TrainState

    cfg = get_actionness_configs(args.dataset)
    # head width follows the actionness config (2 for thumos14, 100 for
    # activitynet1.2 — reference binary_train.py:24,33 / binary_model.py:124);
    # training targets stay 0/1 fg/bg either way, as in the reference
    model = BinaryClassifier(num_class=cfg.num_class,
                             course_segment=args.num_body_segments,
                             modality=args.modality, base_model=args.arch,
                             dropout=args.dropout, bn_mode=args.bn_mode,
                             dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    _, _, spec = get_backbone(args.arch, args.modality)
    new_length = 1 if args.modality == "RGB" else 5

    train_prop_file = os.path.join(args.prop_file_dir,
                                   f"{cfg.train_list}_proposal_list.txt")
    val_prop_file = os.path.join(args.prop_file_dir,
                                 f"{cfg.test_list}_proposal_list.txt")
    # NOTE: --tem is accepted (shared parser) but unused here, matching the
    # reference: its binary_train never applies an epoch multiplier
    # (binary_train.py:80-94)
    train_ds = BinaryDataset(train_prop_file, body_seg=args.num_body_segments,
                             new_length=new_length,
                             verbose=True)
    # validation uses a balanced 6:6 fg/bg split (binary_train.py:101)
    val_ds = (BinaryDataset(val_prop_file, body_seg=args.num_body_segments,
                            new_length=new_length, fg_ratio=6, bg_ratio=6)
              if os.path.exists(val_prop_file) else None)

    if args.synthetic_data:
        provider = SyntheticFrameProvider(modality=args.modality)
    else:
        tmpl = ("img_{:05d}.jpg" if args.modality in ("RGB", "RGBDiff")
                else args.flow_prefix + "{}_{:05d}.jpg")
        provider = DirectoryFrameProvider(args.data_root, tmpl, args.modality)

    augmentation = get_train_augmentation(spec.input_size, args.modality)
    from ..data.transforms import Compose, GroupCenterCrop, GroupScale

    eval_transform = Compose([GroupScale(spec.scale_size),
                              GroupCenterCrop(spec.input_size)])
    S = args.num_body_segments

    def assemble(video_indices, rng, ds=None, random_shift=True):
        ds = ds or train_ds
        transform = augmentation if random_shift else eval_transform
        frames, labels = [], []
        for vi in video_indices:
            s = ds.get_training_sample(vi, rng, random_shift=random_shift)
            for i in range(s.frame_indices.shape[0]):
                vid = s.frame_video_ids[i]
                fc = ds.video_dict[vid].num_frames
                pil = load_proposal_frames(provider, vid, s.frame_indices[i],
                                           fc, new_length)
                stacked = Stack()(transform(pil, rng))
                H, W, C = stacked.shape
                frames.append(stacked.reshape(H, W, S, C // S).transpose(2, 0, 1, 3))
            labels.append(s.labels)
        return {"frames": np.stack(frames).astype(np.uint8),
                "labels": np.concatenate(labels)}

    def loss_fn(params, batch_stats, batch, rng, train=True):
        x = preprocess_frames(batch["frames"], spec, args.modality, new_length)
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if (train and batch_stats is not None) else False
        out = model.apply(variables, x, train=train,
                          rngs={"dropout": rng} if train else None,
                          mutable=mutable)
        if mutable:
            logits, new_vars = out
            new_stats = new_vars.get("batch_stats", batch_stats)
        else:
            logits, new_stats = out, batch_stats
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["labels"]).mean()
        return loss, ({"loss": loss, "acc": accuracy(logits, batch["labels"])},
                      new_stats)

    # peek at the resume checkpoint before building the optimizer: the LR
    # step-decay follows the ABSOLUTE epoch (see ssn_train.py)
    resume_ck = None
    if args.resume and os.path.isfile(args.resume):
        resume_ck = load_checkpoint(args.resume)
    start_epoch = (int(resume_ck["epoch"]) if resume_ck is not None
                   else args.start_epoch)

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    tx = make_optimizer(start_epoch=start_epoch,
                        base_lr=args.lr, lr_steps=args.lr_steps,
                        steps_per_epoch=steps_per_epoch,
                        momentum=args.momentum, weight_decay=args.weight_decay,
                        clip_gradient=args.clip_gradient,
                        iter_size=args.iter_size)

    rng = np.random.RandomState(args.seed)
    init_batch = assemble([0], rng)
    x0 = preprocess_frames(jnp.asarray(init_batch["frames"][:1]), spec,
                           args.modality, new_length)
    from ..models import jitted_init

    variables = jitted_init(model, {"params": jax.random.PRNGKey(args.seed)},
                            x0, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]))

    from ..train.init_weights import apply_init_weights

    state = apply_init_weights(state, args, cfg, load_checkpoint)

    @jax.jit
    def eval_step(state, batch):
        _, (metrics, _) = loss_fn(state.params, state.batch_stats, batch,
                                  jax.random.PRNGKey(0), train=False)
        return metrics

    @jax.jit
    def train_step(state, batch, key):
        key = jax.random.fold_in(key, state.step)
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=new_stats,
                             opt_state=opt_state), metrics

    best_loss = float("inf")
    ckpt_file = checkpoint_name(args.snapshot_pref, args.dataset, args.arch,
                                args.modality, "binary_checkpoint.msgpack")
    if resume_ck is not None:
        state = state.replace(params=resume_ck["params"],
                              batch_stats=resume_ck["batch_stats"] or None)
        best_loss = float(resume_ck["best_loss"])
        print(f"=> resumed from '{args.resume}' (epoch {start_epoch})")

    mesh = make_mesh(select_devices(args.devices))
    state = replicate(state, mesh)
    key = jax.random.PRNGKey(args.seed)

    # multi-host: each process assembles its slice of the global batch
    proc_count = jax.process_count()
    proc_id = jax.process_index()
    local_bs = args.batch_size // proc_count
    assert local_bs * proc_count == args.batch_size, \
        (args.batch_size, proc_count)

    def validate():
        # full validation pass with the deterministic center-crop transform
        # (reference binary_train.py:97-110,133-144)
        v_rng = np.random.RandomState(999)
        n_val = max(len(val_ds.video_list) // args.batch_size, 1)
        losses, accs = [], []
        for i in range(n_val):
            idxs = [(i * args.batch_size + j) % len(val_ds.video_list)
                    for j in range(args.batch_size)]
            # each process assembles only its slice of the global batch
            idxs = idxs[proc_id * local_bs:(proc_id + 1) * local_bs]
            vb = assemble(idxs, v_rng, ds=val_ds, random_shift=False)
            m = eval_step(state, shard_batch(vb, mesh))
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
        # the reference reports validation accuracy too (binary_train.py:133-144)
        return float(np.mean(losses)), float(np.mean(accs))

    order = np.arange(len(train_ds))
    for epoch in range(start_epoch, args.epochs):
        ep_rng = np.random.RandomState(args.seed * 1000 + epoch)
        ep_rng.shuffle(order)
        # per-step seeds drawn single-threaded: make_batch runs on a thread
        # pool and a shared RandomState is not thread-safe
        step_seeds = ep_rng.randint(2 ** 31, size=steps_per_epoch)

        def make_batch(i):
            idxs = order[(i * args.batch_size) % len(order):][:args.batch_size]
            if len(idxs) < args.batch_size:
                idxs = np.concatenate([idxs, order[:args.batch_size - len(idxs)]])
            idxs = idxs[proc_id * local_bs:(proc_id + 1) * local_bs]
            return assemble(idxs, np.random.RandomState(step_seeds[i]))

        loader = PrefetchLoader(make_batch, steps_per_epoch,
                                num_threads=args.workers)
        from ..utils.meters import MeterBank

        bank = MeterBank()
        t0 = time.time()
        for i, batch in enumerate(loader):
            state, metrics = train_step(state, shard_batch(batch, mesh), key)
            if i % args.print_freq == 0:
                # fetched (and metered) only at print ticks; see ssn_train
                bank.update({k: float(v) for k, v in metrics.items()})
                print(f"Epoch: [{epoch}][{i}/{steps_per_epoch}] "
                      f"Time {(time.time() - t0) / (i + 1):.3f} "
                      f"Loss {bank['loss']:.4f} "
                      f"Acc {bank['acc']:.2f}", flush=True)

        val_loss = float("nan")
        is_best = False
        if val_ds is not None and (epoch + 1) % max(args.eval_freq, 1) == 0:
            val_loss, val_acc = validate()
            is_best = val_loss < best_loss
            best_loss = min(best_loss, val_loss)
            print(f"Validation: Loss {val_loss:.4f} Acc {val_acc:.2f} "
                  f"(best {best_loss:.4f})")

        if proc_id == 0:
            save_checkpoint(ckpt_file, jax.device_get(state.params),
                            np.zeros((2, 2)),
                            batch_stats=jax.device_get(state.batch_stats),
                            epoch=epoch + 1, arch=args.arch,
                            best_loss=best_loss, is_best=is_best)
            print(f"checkpoint saved to {ckpt_file} (best={is_best})")


if __name__ == "__main__":
    main()
