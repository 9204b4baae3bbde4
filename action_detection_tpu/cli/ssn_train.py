"""SSN training CLI (parity target: /root/reference/ssn_train.py).

Usage: python ssn_train.py <dataset> <modality> [flags]
"""

from __future__ import annotations

import os
import time

import numpy as np


def main(argv=None):
    from .opts import build_train_parser

    args = build_train_parser(
        "Train Structured Segment Networks (TPU-native)").parse_args(argv)

    import jax

    # join the multi-host job before any other jax call (no-op single host;
    # DCN between hosts, ICI within; the mesh below spans all global devices)
    from ..parallel import initialize_multihost

    initialize_multihost(args.coordinator_address, args.num_processes,
                         args.process_id)
    import jax.numpy as jnp

    from ..config import get_configs
    from ..data.pipeline import (DirectoryFrameProvider, PrefetchLoader,
                                 SyntheticFrameProvider, assemble_train_batch)
    from ..data.ssn_dataset import SSNDataset
    from ..data.transforms import get_train_augmentation
    from ..models import SSN
    from ..models.backbones import get_backbone
    from ..parallel import make_mesh, replicate, select_devices, shard_batch
    from ..train import (LossWeights, checkpoint_name, create_train_state,
                         load_checkpoint, make_eval_step, make_optimizer,
                         make_train_step, save_checkpoint)

    cfg = get_configs(args.dataset)
    stpp_cfg = cfg.stpp
    sampling = cfg.sampling

    model = SSN(num_class=cfg.num_class,
                starting_segment=args.num_aug_segments,
                course_segment=args.num_body_segments,
                ending_segment=args.num_aug_segments,
                modality=args.modality, base_model=args.arch,
                dropout=args.dropout, stpp_cfg=stpp_cfg, bn_mode=args.bn_mode,
                dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                remat=args.remat)
    _, _, spec = get_backbone(args.arch, args.modality)
    new_length = model.resolved_new_length

    train_prop_file = os.path.join(args.prop_file_dir,
                                   f"{cfg.train_list}_proposal_list.txt")
    val_prop_file = os.path.join(args.prop_file_dir,
                                 f"{cfg.test_list}_proposal_list.txt")
    train_ds = SSNDataset(train_prop_file, sampling, new_length=new_length,
                          body_seg=args.num_body_segments,
                          aug_seg=args.num_aug_segments,
                          epoch_multiplier=args.training_epoch_multiplier,
                          verbose=True)
    val_ds = SSNDataset(val_prop_file, sampling, new_length=new_length,
                        body_seg=args.num_body_segments,
                        aug_seg=args.num_aug_segments,
                        reg_stats=train_ds.stats, verbose=True)

    if args.synthetic_data:
        provider = SyntheticFrameProvider(modality=args.modality)
    else:
        tmpl = ("img_{:05d}.jpg" if args.modality in ("RGB", "RGBDiff")
                else args.flow_prefix + "{}_{:05d}.jpg")
        provider = DirectoryFrameProvider(args.data_root, tmpl, args.modality)

    augmentation = get_train_augmentation(spec.input_size, args.modality)
    # validation protocol: scale + center crop, no random shift
    # (reference ssn_train.py:115-131)
    from ..data.transforms import Compose, GroupCenterCrop, GroupScale

    eval_transform = Compose([GroupScale(spec.scale_size),
                              GroupCenterCrop(spec.input_size)])

    # peek at the resume checkpoint before building the optimizer: the LR
    # step-decay follows the ABSOLUTE epoch (reference ssn_train.py:391-398)
    resume_ck = None
    if args.resume and os.path.isfile(args.resume):
        resume_ck = load_checkpoint(args.resume)
    start_epoch = (int(resume_ck["epoch"]) if resume_ck is not None
                   else args.start_epoch)

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    tx = make_optimizer(base_lr=args.lr, lr_steps=args.lr_steps,
                        steps_per_epoch=steps_per_epoch,
                        momentum=args.momentum, weight_decay=args.weight_decay,
                        clip_gradient=args.clip_gradient,
                        iter_size=args.iter_size, start_epoch=start_epoch)

    rng = np.random.RandomState(args.seed)
    init_batch = assemble_train_batch(train_ds, [0], provider, augmentation, rng)
    state = create_train_state(model, tx, init_batch, spec, seed=args.seed,
                               modality=args.modality)

    from ..train.init_weights import apply_init_weights

    state = apply_init_weights(state, args, cfg, load_checkpoint)

    best_loss = float("inf")
    if resume_ck is not None:
        state = state.replace(params=resume_ck["params"],
                              batch_stats=resume_ck["batch_stats"] or None)
        best_loss = float(resume_ck["best_loss"])
        print(f"=> resumed from '{args.resume}' (epoch {start_epoch})")

    weights = LossWeights(comp=args.comp_loss_weight, reg=args.reg_loss_weight)
    train_step = make_train_step(model, tx, sampling, spec, weights,
                                 modality=args.modality)
    eval_step = make_eval_step(model, sampling, spec, weights,
                               modality=args.modality)

    mesh = make_mesh(select_devices(args.devices))
    state = replicate(state, mesh)
    dropout_key = jax.random.PRNGKey(args.seed)

    n_videos = len(train_ds)
    order = np.arange(n_videos)

    # multi-host: each process assembles its slice of the global batch
    proc_count = jax.process_count()
    proc_id = jax.process_index()
    local_bs = args.batch_size // proc_count
    assert local_bs * proc_count == args.batch_size, \
        (args.batch_size, proc_count)

    def make_batch_fn(step_seeds, batch_order):
        # per-step seeds are drawn single-threaded up front: make_batch runs
        # on the PrefetchLoader's thread pool and a shared RandomState is not
        # thread-safe (a race would make sampling irreproducible)
        def make_batch(i):
            idxs = batch_order[i * args.batch_size:(i + 1) * args.batch_size]
            idxs = idxs[proc_id * local_bs:(proc_id + 1) * local_bs]
            local_rng = np.random.RandomState(step_seeds[i])
            return assemble_train_batch(train_ds, idxs, provider, augmentation,
                                        local_rng)
        return make_batch

    ckpt_file = checkpoint_name(args.snapshot_pref, args.dataset, args.arch,
                                args.modality)

    def validate():
        v_rng = np.random.RandomState(12345)
        n_val = max(len(val_ds) // args.batch_size, 1)
        losses = []
        for i in range(n_val):
            idxs = [(i * args.batch_size + j) % len(val_ds.video_list)
                    for j in range(args.batch_size)]
            idxs = idxs[proc_id * local_bs:(proc_id + 1) * local_bs]
            batch = assemble_train_batch(val_ds, idxs, provider, eval_transform,
                                         v_rng, random_shift=False)
            metrics = eval_step(state, shard_batch(batch, mesh))
            losses.append(float(metrics["loss"]))
            if i % args.print_freq == 0:
                print(f"Test: [{i}/{n_val}] Loss {losses[-1]:.4f} "
                      f"Act acc {float(metrics['act_acc']):.2f} "
                      f"FG {float(metrics['fg_acc']):.2f} "
                      f"BG {float(metrics['bg_acc']):.2f}", flush=True)
        avg = float(np.mean(losses))
        print(f"Testing Results: Loss {avg:.5f}")
        return avg

    if args.evaluate:
        validate()
        return

    for epoch in range(start_epoch, args.epochs):
        epoch_rng = np.random.RandomState(args.seed * 1000 + epoch)
        epoch_rng.shuffle(order)
        batch_order = np.tile(order, 2)[:steps_per_epoch * args.batch_size]
        step_seeds = epoch_rng.randint(2 ** 31, size=steps_per_epoch)
        loader = PrefetchLoader(make_batch_fn(step_seeds, batch_order),
                                steps_per_epoch, num_threads=args.workers)
        # running val (avg) meters, the reference's AverageMeter print style
        # (ssn_train.py:259-275)
        from ..utils.meters import MeterBank

        bank = MeterBank()
        t0 = time.time()
        for i, batch in enumerate(loader):
            if args.trace_dir and epoch == start_epoch and i == 1:
                # trace one steady-state step (skip the compile step)
                from ..utils.meters import device_trace

                with device_trace(args.trace_dir):
                    state, metrics = train_step(state, shard_batch(batch, mesh),
                                                dropout_key)
                    jax.block_until_ready(metrics["loss"])
                continue
            state, metrics = train_step(state, shard_batch(batch, mesh),
                                        dropout_key)
            if i % args.print_freq == 0:
                # metrics are fetched (and metered) only at print ticks — a
                # per-step host fetch would sync the dispatch queue every step
                bank.update({k: float(v) for k, v in metrics.items()})
                print(f"Epoch: [{epoch}][{i}/{steps_per_epoch}] "
                      f"Time {(time.time() - t0) / (i + 1):.3f} "
                      f"Loss {bank['loss']:.4f} "
                      f"Act {bank['act_loss']:.3f} "
                      f"Comp {bank['comp_loss']:.3f} "
                      f"Reg {bank['reg_loss']:.3f} "
                      f"FG {bank['fg_acc']:.2f} "
                      f"BG {bank['bg_acc']:.2f}", flush=True)

        if (epoch + 1) % args.eval_freq == 0 or epoch == args.epochs - 1:
            loss = validate()
            is_best = loss < best_loss
            best_loss = min(loss, best_loss)
            if proc_id == 0:
                # only process 0 writes: same-path os.replace from N hosts on
                # a shared filesystem can interleave tmp files (the loss is
                # already all-reduced, so every process agrees on best_loss)
                save_checkpoint(ckpt_file, jax.device_get(state.params),
                                train_ds.stats,
                                batch_stats=jax.device_get(state.batch_stats),
                                epoch=epoch + 1, arch=args.arch,
                                best_loss=best_loss, is_best=is_best)
                print(f"checkpoint saved to {ckpt_file} (best={is_best})")


if __name__ == "__main__":
    main()
