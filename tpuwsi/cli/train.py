"""Training entry point.

Parity: train.py ``main()`` (train.py:413-986) — model/optim/schedule/EMA
setup, WSI or folder datasets, epoch loop with slide-level validation every
``--eval_rate`` epochs (train.py:905-977), checkpointing, summary.csv, and
the ``--extract_features`` inference mode (train.py:1281-1282) — plus the
DINO SSL mode (``--ssl``) that makes the reference's latent self-supervised
capability real (SURVEY §0).

TPU-native orchestration: one jitted train step with on-device augmentation,
batch sharded over the mesh data axis, params replicated (GSPMD gradient
all-reduce replaces DDP), host-threaded tile prefetch.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional

import numpy as np

import jax

from tpuwsi.infer.pipeline import pipelined_fetch


def _setup_jax():
    from tpuwsi.core.compile import machine_cache_dir

    if ("xla_force_host_platform_device_count"
            in os.environ.get("XLA_FLAGS", "")
            and os.cpu_count() and os.cpu_count() < 16):
        # Virtual CPU meshes on few-core hosts deadlock XLA:CPU collectives
        # unless the client pools hold a thread per device (see
        # tests/conftest.py) — harmless on TPU, set before backend init.
        os.environ.setdefault("NPROC", "16")
        os.environ.setdefault("PJRT_NPROC", "16")

    cache = machine_cache_dir(
        os.environ.get("TPUWSI_COMPILE_CACHE", "/tmp/tpuwsi_jax_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def save_batch_images(images, labels, out_dir: str, filename: str,
                      max_tiles: int = 16):
    """-im manual-QA image dump: a grid PNG of raw (pre-augmentation) tiles,
    label stamped in the filename row order (datasets.py:504-508 returns the
    untransformed images; reference train keeps them for debugging)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    imgs = np.asarray(images)[:max_tiles]
    if imgs.ndim == 5:  # (B, bag, h, w, 3) → first tile of each bag
        imgs = imgs[:, 0]
    n = len(imgs)
    cols = min(n, 4)
    rows = -(-n // cols)
    h, w = imgs.shape[1:3]
    grid = np.zeros((rows * h, cols * w, 3), dtype=np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    Image.fromarray(grid).save(os.path.join(out_dir, filename))
    if labels is not None:
        with open(os.path.join(out_dir, filename + ".labels.txt"), "w") as f:
            f.write(",".join(str(int(l)) for l in np.asarray(labels).ravel()[:max_tiles]))


def _fitting_mesh(global_batch_size: int, model_parallel: int = 1):
    """dp×tp mesh over the GLOBAL device set: the model axis is sized by
    --model-parallel, the data axis is the largest count of remaining
    devices that divides the global batch (batch must shard evenly)."""
    import math

    from tpuwsi.core.mesh import MeshConfig, create_mesh

    n = len(jax.devices())
    model = max(1, model_parallel)
    if n % model != 0:
        raise ValueError(
            f"--model-parallel {model} does not divide device count {n}"
        )
    data = math.gcd(global_batch_size, n // model)
    if jax.process_count() > 1 and data * model != n:
        # A sub-mesh is only valid single-process: jax.devices() is
        # process-major, so truncating it strands later processes with zero
        # addressable devices in the mesh (their shard_batch/collectives
        # would fail with an opaque runtime error).
        raise ValueError(
            f"global batch {global_batch_size} with --model-parallel {model} "
            f"uses only {data * model} of {n} devices; on multi-host runs the "
            "global batch must be divisible by devices/model-parallel "
            f"({n // model})."
        )
    return create_mesh(
        MeshConfig(data=data, model=model),
        devices=jax.devices()[: data * model],
    )


def _resolve_input_geometry(args):
    """timm --input-size (c h w) / --in-chans / --img-size precedence:
    --input-size wins on both axes; --in-chans default 3. Mutates args so
    every downstream ``args.img_size`` reader agrees."""
    if args.input_size is not None:
        c, h, w = args.input_size
        if h != w:
            raise SystemExit("--input-size: only square inputs supported")
        args.img_size = h
        if args.in_chans is None:
            args.in_chans = c
    if args.in_chans is None:
        args.in_chans = 3
    if args.in_chans != 3:
        # checked BEFORE the --ssl / Survival_* dispatch so no path can
        # silently train RGB under a non-default channel request
        survival = args.target in ("Survival_Time", "Survival_Binary")
        if args.ssl or survival or not args.data_dir:
            raise SystemExit(
                "--in-chans != 3 only applies to folder-mode supervised "
                "training (WSI tiles and the DINO multi-crop are RGB)"
            )
        if args.transform_type != "timm":
            raise SystemExit(
                "--in-chans != 3 needs --transform_type timm (the GipMed "
                "recipes are RGB: color jitter + RGB normalization banks)"
            )
    return args.img_size, args.in_chans


def _default_interp(model_name: str) -> str:
    """timm data-config interpolation default: bicubic for the ViT family,
    bilinear for the CNN zoo (resnet50_trunc)."""
    return "bicubic" if model_name.startswith("vit") else "bilinear"


def _opt_extra_kwargs(args) -> dict:
    """timm --opt-eps / --opt-betas: override the OptimConfig defaults only
    when given (timm passes None through to the optimizer default too)."""
    extra = {}
    if args.opt_eps is not None:
        extra["eps"] = args.opt_eps
    if args.opt_betas is not None:
        if len(args.opt_betas) != 2:
            raise SystemExit("--opt-betas takes exactly two values")
        extra["betas"] = tuple(args.opt_betas)
    return extra


def main(argv=None, default_overrides=None):
    import jax.numpy as jnp

    from tpuwsi.cli.args import parse_args
    from tpuwsi.core.mesh import MeshConfig, create_mesh, shard_batch
    from tpuwsi.io.folder import ImageFolderDataset
    from tpuwsi.io.metadata import load_slide_table
    from tpuwsi.io.wsi import Prefetcher, WSITileSampler
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess import make_recipe
    from tpuwsi.train import (
        CheckpointManager,
        OptimConfig,
        compile_step,
        create_train_state,
        load_checkpoint,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from tpuwsi.train.losses import binary_cross_entropy, cross_entropy, focal_loss
    from tpuwsi.utils import start_log, update_summary
    from tpuwsi.utils.ledger import ExperimentLedger

    args = parse_args(argv, default_overrides=default_overrides)
    if args.pretrained:
        # timm --pretrained pulls from its hub; unsupported here by decision
        # (PARITY.md non-goals) — point at the offline converter instead.
        # Checked FIRST: it must also cover --ssl / Survival_* dispatch and
        # fire before any dataset/metadata work.
        raise SystemExit(
            "--pretrained downloads from the timm hub, which this "
            "environment cannot reach. Convert torch weights offline with "
            "tpuwsi.models.convert (ViT + ResNet-50-trunc, golden-tested) "
            "and pass them via --initial-checkpoint."
        )
    if args.drop_connect is not None:
        # timm deprecation-warns and remaps; we refuse loudly instead so a
        # migrated sbatch line can't half-work (PARITY.md non-goals).
        raise SystemExit(
            "--drop-connect is timm's deprecated alias — pass --drop-path "
            "(ViT layer-drop / EfficientNet per-block stochastic depth)."
        )
    if getattr(args, "model_parallel", 1) > 1 and not args.model.startswith(
            "vit_"):
        # the TP partition rules cover the ViT GEMMs (parallel/sharding);
        # a CNN tree matches none of them, so every model-axis replica
        # would silently repeat identical work on the same data shard
        raise SystemExit(
            "--model-parallel covers the ViT family; CNN classifiers "
            f"({args.model}) run data-parallel — drop --model-parallel."
        )
    _setup_jax()
    # multi-host init (reference: torchrun + init_distributed_device,
    # train.py:431, sbatch-ssl.sh:55) — no-op single-host
    from tpuwsi.core.distributed import initialize_multihost

    pindex, pcount = initialize_multihost()
    _resolve_input_geometry(args)
    start_log(args, to_file=bool(args.output), output_dir=args.output or None)

    ledger = ExperimentLedger(args.output or "runs")
    exp = ledger.create(
        args.target,
        test_fold=args.test_fold,
        name=args.experiment or None,
        subname=args.subexperiment or None,
        DataSet=args.dataset,
        Model=args.model,
        Transformations=args.transform_type,
        **{"Tile Size": args.tile_size, "Learning Rate": args.lr or args.lr_base,
           "Weight Decay": args.weight_decay,
           "Desired Slide Magnification": args.mag},
    )
    output_dir = exp["Location"]

    if args.ssl:
        return train_ssl(args, output_dir)
    if args.target in ("Survival_Time", "Survival_Binary"):
        # The reference's DEFAULT target (train.py:370) routes through the
        # survival dataset family (datasets.py:2354-3461) and censored
        # objectives, not classification CE.
        return train_survival(args, output_dir, ledger, exp)

    # ---------------- data ----------------
    folder_mode = bool(args.data_dir)
    if args.aug_repeats and not folder_mode:
        raise SystemExit("--aug-repeats is a folder-mode (timm loader) "
                         "feature; WSI sampling has factor-based virtual "
                         "epochs instead")
    if folder_mode:
        from tpuwsi.io.folder import load_folder_datasets

        # train/ + val/ subtrees when present (timm convention), else an
        # 80/20 random split — folder mode validates every epoch like the
        # reference trainer (timm_train.py:951-1025).
        train_ds, val_ds = load_folder_datasets(
            args.data_dir, image_size=args.img_size,
            train_split=args.train_split,
            class_map=args.class_map or None,
            channels=args.in_chans,
        )
        if val_ds is None and args.val_split > 0 and len(train_ds) >= 10:
            train_ds, val_ds = train_ds.split(
                1.0 - args.val_split, np.random.default_rng(args.seed)
            )
        if args.transform_type == "timm" and val_ds is not None:
            # timm eval = Resize(img_size/crop_pct) -> CenterCrop(img_size):
            # the HOST loader must hand the eval transform the resize target,
            # not an already-img_size image (which would up/down round-trip
            # and crop away real content — review finding r3).
            eval_img = args.img_size or args.tile_size
            val_ds.image_size = max(
                int(round(eval_img / args.crop_pct)), eval_img
            )
        num_classes = args.num_output or args.num_classes or train_ds.num_classes
        # each host consumes a 1/pcount strided slice of the dataset, so the
        # schedule must count PER-HOST optimizer steps (global batch rows
        # per step = batch_size * pcount)
        steps_per_epoch = max(len(train_ds) // (args.batch_size * pcount), 1)
    else:
        table = load_slide_table(
            args.dataset,
            tile_size=args.tile_size,
            target_kind=args.target,
            test_fold=args.test_fold,
            train=not args.supervised,
            train_type="REG",
            infer_folds=[args.test_fold] if args.supervised else (None,),
            n_tiles=args.n_patches_train,
            desired_magnification=args.mag,
            dx=args.dx,
            er_eq_pr=args.er_eq_pr,
            ram_saver=args.RAM_saver,
            balanced_dataset=args.balanced_dataset,
            slide_per_block=args.slide_per_block,
            data_root=args.data_root,
        )
        if args.supervised:
            # --supervised: 80/20 random split of the test fold
            # (train.py:715-717)
            from tpuwsi.io.metadata import split_table

            table, _val_table = split_table(
                table, 0.8, np.random.default_rng(args.seed)
            )
        sampler = WSITileSampler(
            table,
            n_tiles=args.n_patches_train,
            bag_size=1,
            num_threads=args.workers,
            balanced_sampling=args.balanced_sampling,
            loan=args.loan,
            print_timing=args.time,
        )
        # multi-target '+'-joined kinds (datasets.py:55-61): T independent
        # 2-class heads; the reference relies on user-set --num-classes +
        # its manual timm CE patch (train_instruct.txt:3-8)
        n_targets = len(args.target.split("+")) if "+" in args.target else 1
        num_classes = args.num_output or args.num_classes or 2 * n_targets
        steps_per_epoch = max(len(sampler) // (args.batch_size * pcount), 1)

    # ---------------- model + optimizer ----------------
    on_tpu = jax.default_backend() == "tpu"
    img_size = args.img_size or args.tile_size
    model = create_model(
        args.model,
        num_classes=num_classes,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path or 0.0,
        img_size=img_size,
        use_pallas_attention=on_tpu,
        grad_checkpointing=args.grad_checkpointing,
        bn_momentum=args.bn_momentum,
        bn_eps=args.bn_eps,
        # tuned saved-probs backward for the training step (scripts/
        # exp_sup4.py A/B; inference-only paths keep it off — the extra
        # forward HBM write buys nothing without a backward)
        attn_save_probs=on_tpu,
    )
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, img_size, img_size, args.in_chans), jnp.float32),
    )
    # BatchNorm models (resnet50): running statistics live on
    # TrainState.batch_stats, not under the optimizer — the train step
    # updates them with mutable=['batch_stats'] (torch semantics)
    batch_stats = variables.get("batch_stats") if isinstance(variables, dict) else None
    params = {"params": variables["params"]} if batch_stats is not None else variables
    # global batch = per-host batch × process count (train.py:569-581 LR
    # scaling uses the same product); the mesh spans all global devices.
    global_batch = args.batch_size * pcount
    mesh = _fitting_mesh(global_batch, args.model_parallel)
    tp = args.model_parallel > 1
    if tp:
        from tpuwsi.parallel.sharding import shard_params

        params = shard_params(mesh, params)
    ocfg = OptimConfig(
        opt=args.opt,
        lr=args.lr,
        base_lr=args.lr_base,
        lr_base_size=args.lr_base_size,
        lr_base_scale=args.lr_base_scale
        or ("sqrt" if any(o in args.opt for o in ("ada", "lamb")) else "linear"),
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        clip_grad=args.clip_grad,
        clip_mode=args.clip_mode,
        sched=args.sched,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        warmup_lr=args.warmup_lr,
        min_lr=args.min_lr,
        cooldown_epochs=args.cooldown_epochs,
        steps_per_epoch=steps_per_epoch,
        decay_epochs=args.decay_epochs,
        decay_rate=args.decay_rate,
        decay_milestones=(tuple(args.decay_milestones)
                          if args.decay_milestones else None),
        patience_epochs=args.patience_epochs,
        lr_cycle_mul=args.lr_cycle_mul,
        lr_cycle_decay=args.lr_cycle_decay,
        lr_cycle_limit=args.lr_cycle_limit,
        lr_k_decay=args.lr_k_decay,
        warmup_prefix=args.warmup_prefix,
        lr_noise=tuple(args.lr_noise) if args.lr_noise else None,
        lr_noise_pct=args.lr_noise_pct,
        lr_noise_std=args.lr_noise_std,
        seed=args.seed,
        layer_decay=args.layer_decay,
        **_opt_extra_kwargs(args),
        # timm --start-epoch advances the scheduler to that epoch; resumed
        # runs restore the optax counts from the checkpoint instead.
        schedule_offset_steps=(
            args.start_epoch * steps_per_epoch
            if args.start_epoch and not args.resume else 0
        ),
    )
    tx, schedule = make_optimizer(ocfg, params, global_batch)
    plateau = None
    if args.sched == "plateau":
        # timm PlateauLRScheduler (train.py:883-887): host-side controller
        # steps on the epoch eval metric; the cumulative scale lives in the
        # optimizer state (value surgery, no recompile) and therefore rides
        # checkpoints/resume with the rest of opt_state.
        from tpuwsi.train.optim import PlateauController

        plateau = PlateauController(
            factor=args.decay_rate, patience=args.patience_epochs,
            mode="min" if "loss" in args.eval_metric else "max",
            min_scale=args.min_lr / max(ocfg.resolved_lr(global_batch),
                                        1e-12),
        )
    if args.no_grad:
        # --no-grad head-only finetuning (train.py:498-503)
        from tpuwsi.train.optim import freeze_non_head

        tx = freeze_non_head(tx, params)
    state = create_train_state(params, tx, ema=args.model_ema,
                               batch_stats=batch_stats)

    ckpt = CheckpointManager(
        os.path.join(output_dir, "checkpoints"),
        max_history=args.checkpoint_hist,
        metric_name=args.eval_metric,
    )
    # mid-epoch recovery checkpoints live in their own latest-N manager:
    # under the best-K manager they carry no eval metric, rank worst, and
    # get garbage-collected first — defeating crash recovery
    ckpt_rec = (
        CheckpointManager(
            os.path.join(output_dir, "checkpoints", "recovery"),
            max_history=2, rank_by_metric=False,
        )
        if args.recovery_interval else None
    )
    # optax count the schedule sees = global step - this offset (non-zero
    # only for --no-resume-opt, whose rebuilt schedule bakes the offset in)
    sched_count_offset = 0
    if args.resume:
        restored = load_checkpoint(args.resume, target=state)
        if restored is not None:
            if args.no_resume_opt:
                # timm --no-resume-opt (train.py:604-613): weights, EMA and
                # epoch position come back; optimizer moments start fresh —
                # but the LR schedule stays advanced to the resume step
                # (timm steps the scheduler to resume_epoch regardless).
                ocfg_res = dataclasses.replace(
                    ocfg, schedule_offset_steps=int(restored.step)
                )
                tx, schedule = make_optimizer(ocfg_res, params, global_batch)
                if args.no_grad:
                    from tpuwsi.train.optim import freeze_non_head

                    tx = freeze_non_head(tx, params)
                state = create_train_state(
                    restored.params, tx, ema=args.model_ema,
                    batch_stats=restored.batch_stats,
                )
                state = state.replace(
                    step=restored.step,
                    ema_params=(restored.ema_params
                                if args.model_ema else None),
                    ema_batch_stats=(restored.ema_batch_stats
                                     if args.model_ema else None),
                )
                sched_count_offset = int(restored.step)
            else:
                state = restored
            logging.info("resumed from %s at step %d", args.resume, int(state.step))
    if plateau is not None and args.resume and not args.no_resume_opt:
        # re-sync the host controller with the checkpointed cumulative
        # scale (torch ReduceLROnPlateau state_dict semantics); under
        # --no-resume-opt the optimizer restarts fresh, scale included
        from tpuwsi.train.optim import get_plateau_scale

        restored_scale = get_plateau_scale(state.opt_state)
        if restored_scale is not None:
            plateau.scale = restored_scale
    warm = args.initial_checkpoint or args.transfer_learning
    if warm and not args.resume:
        # --initial-checkpoint / -tl warm start (train.py:114-115, 386):
        # params only — fresh optimizer/schedule.
        donor = load_checkpoint(warm, target=state)
        if donor is not None:
            # params AND BatchNorm running stats (timm load_checkpoint loads
            # running_mean/var with the weights — identity-init stats would
            # wreck transfer evals until re-estimated)
            state = state.replace(params=donor.params,
                                  batch_stats=donor.batch_stats)
            logging.info("warm-started params from %s", warm)

    multi_target = "+" in args.target and not folder_mode
    if multi_target:
        if args.focal or args.bce_loss:
            raise SystemExit(
                "multi-target ('+') training uses the masked per-head CE "
                "(train_instruct.txt:3-8 patched-gather semantics); drop "
                "--focal/--bce-loss"
            )
        if args.mixup > 0 or args.cutmix > 0 or args.cutmix_minmax:
            # Mixup one-hots a (B,) label vector; multi-target labels are a
            # (B, T) matrix with -1 unknowns — the soft targets would be
            # shaped (B, T, C) against (B, T*2) logits (and unknowns would
            # one-hot to garbage instead of masking). timm's Mixup has the
            # same single-label contract.
            raise SystemExit(
                "--mixup/--cutmix need single-label targets; not supported "
                "with multi-target ('+') training"
            )
        from tpuwsi.train.losses import multi_target_cross_entropy

        loss_fn = lambda l, y: multi_target_cross_entropy(l, y, args.smoothing)
    elif args.focal:
        loss_fn = focal_loss
    elif args.bce_loss:
        loss_fn = lambda l, y: binary_cross_entropy(
            l, y, args.smoothing, target_thresh=args.bce_target_thresh
        )
    else:
        loss_fn = lambda l, y: cross_entropy(l, y, args.smoothing)
    if args.jsd_loss:
        # timm --jsd-loss (AugMix protocol): smoothed CE on the clean split
        # + Jensen-Shannon consistency across all splits
        if args.aug_splits < 2:
            raise SystemExit("--jsd-loss needs --aug-splits > 1 (timm "
                             "asserts the same)")
        if multi_target or args.focal or args.bce_loss:
            raise SystemExit("--jsd-loss replaces the base loss; drop "
                             "--focal/--bce-loss/multi-target")
        from tpuwsi.train.losses import jsd_cross_entropy

        loss_fn = lambda l, y: jsd_cross_entropy(
            l, y, num_splits=args.aug_splits, smoothing=args.smoothing
        )

    if args.no_aug:
        # timm --no-aug (transforms_noaug_train): train batches get the
        # plain resize+normalize eval transform, no stochastic augs.
        if folder_mode and args.transform_type == "timm":
            from tpuwsi.preprocess.timm_aug import make_timm_eval

            aug = make_timm_eval(img_size, crop_pct=1.0, mean=args.mean,
                                 std=args.std,
                                 interpolation=args.interpolation
                                 or _default_interp(args.model))
        else:
            aug = make_recipe(
                args.transform_type, train=False, tile_size=img_size,
                norm_type="Amir" if args.dataset.startswith("TMA") else "Ron",
            )
    elif folder_mode and args.transform_type == "timm":
        # real timm create_transform stack (timm_train.py:614-663): RRC +
        # flips + ColorJitter (suppressed under auto-augment, like timm) +
        # mean/std normalization, all on device
        from tpuwsi.preprocess.timm_aug import make_timm_train_aug

        # timm interpolation resolution (timm_train.py:778-780): the train
        # interpolation falls back to the model data-config (bicubic for
        # ViT) when unset or under --no-aug. One builder serves the main
        # stack, the --aug-splits clean split and the per-split
        # secondaries, so their geometry can never diverge.
        def _build_timm_aug(color_jitter, jitter_salt=0):
            return make_timm_train_aug(
                img_size, scale=args.scale, ratio=args.ratio,
                hflip=args.hflip, vflip=args.vflip,
                color_jitter=color_jitter, jitter_salt=jitter_salt,
                mean=args.mean, std=args.std,
                interpolation=(args.train_interpolation
                               or args.interpolation
                               or _default_interp(args.model)),
            )

        aug = _build_timm_aug(None if args.aa else args.color_jitter)
    else:
        aug = make_recipe(
            args.transform_type, train=True, tile_size=img_size,
            color_param=args.c_param,
            norm_type="Amir" if args.dataset.startswith("TMA") else "Ron",
        )
    # timm folder-mode batch augs (timm_train.py:238-271, 585-612):
    # RandAugment/AugMix on raw uint8 → recipe (aug+norm) → RandomErasing;
    # Mixup/CutMix runs inside the step on the normalized batch.
    aa_fn = re_fn = None
    if (args.aa or args.reprob > 0) and not args.no_aug:
        from tpuwsi.preprocess.batch_aug import (
            make_auto_augment,
            make_random_erasing,
        )

        aa_fn = make_auto_augment(args.aa) if args.aa else None
        re_fn = (
            make_random_erasing(args.reprob, mode=args.remode,
                                count=args.recount)
            if args.reprob > 0 else None
        )
    if args.aug_splits:
        # timm --aug-splits / AugMixDataset (timm_train.py:563-583): N
        # augmented views per sample, concatenated along the batch axis.
        # The primary crop/flip is SHARED across splits (one key, like
        # AugMixDataset applying the base transform once); split 0 is the
        # clean split (no AA/ColorJitter; erasing only without --resplit);
        # splits 1.. get the secondary policy + erasing.
        if args.aug_splits < 2:
            raise SystemExit("--aug-splits must be 0 or > 1 (timm asserts "
                             "the same)")
        if not (folder_mode and args.transform_type == "timm") or args.no_aug:
            raise SystemExit(
                "--aug-splits needs folder mode with the timm transform "
                "stack (--transform_type timm), the reference's "
                "timm_train.py loader surface; --no-aug conflicts"
            )
        if args.mixup > 0 or args.cutmix > 0 or args.cutmix_minmax:
            raise SystemExit("--aug-splits with mixup/cutmix is not "
                             "supported; drop one of them")
        if not args.jsd_loss:
            # timm trains splits without JSD only via --split-bn (a
            # documented non-goal, PARITY.md); plain CE would see N*B
            # logits vs B labels and die with an opaque trace-time error
            raise SystemExit("--aug-splits needs --jsd-loss (the split-BN "
                             "variant is a documented non-goal)")
        # clean split: no ColorJitter/AA. Secondary splits: same crop/flip
        # KEY (the primary transform is shared, AugMixDataset semantics)
        # but per-split jitter salt — timm applies the secondary stack
        # independently per split.
        base_clean = _build_timm_aug(None)
        secondaries = [
            _build_timm_aug(None if args.aa else args.color_jitter,
                            jitter_salt=s)
            for s in range(1, args.aug_splits)
        ]
        n_splits, resplit = args.aug_splits, args.resplit

        def aug(key, images, _aa=aa_fn, _re=re_fn, _clean=base_clean,
                _secs=secondaries):
            kp, ks, ke = jax.random.split(key, 3)
            outs = []
            for s in range(n_splits):
                x = images
                if s > 0 and _aa is not None:
                    x = _aa(jax.random.fold_in(ks, s), x)
                x = (_clean if s == 0 else _secs[s - 1])(kp, x)
                if _re is not None and (s > 0 or not resplit):
                    x = _re(jax.random.fold_in(ke, s), x)
                outs.append(x)
            return jnp.concatenate(outs, axis=0)

    elif aa_fn is not None or re_fn is not None:
        base_aug = aug

        def aug(key, images, _ra=aa_fn, _re=re_fn, _base=base_aug):
            k1, k2, k3 = jax.random.split(key, 3)
            if _ra is not None:
                images = _ra(k1, images)
            images = _base(k2, images)
            if _re is not None:
                images = _re(k3, images)
            return images

    mix_fn = None
    # cutmix_minmax alone enables cutmix too (timm mixup_active includes it)
    if args.mixup > 0 or args.cutmix > 0 or args.cutmix_minmax:
        from tpuwsi.preprocess.batch_aug import make_mixup_cutmix

        mix_fn = make_mixup_cutmix(
            num_classes,
            mixup_alpha=args.mixup,
            cutmix_alpha=args.cutmix,
            prob=args.mixup_prob,
            switch_prob=args.mixup_switch_prob,
            smoothing=args.smoothing,
            mode=args.mixup_mode,
            cutmix_minmax=args.cutmix_minmax,
        )
    soft_loss_fn = None
    if args.bce_loss:
        # timm BinaryCrossEntropy applies to MIXED targets too (and the
        # --bce-target-thresh re-binarization is mainly about those)
        from tpuwsi.train.losses import binary_cross_entropy_soft

        soft_loss_fn = lambda l, y: binary_cross_entropy_soft(
            l, y, target_thresh=args.bce_target_thresh
        )
    step_fn = make_train_step(
        model.apply, tx, augment_fn=aug, loss_fn=loss_fn,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        mix_fn=mix_fn,
        soft_loss_fn=soft_loss_fn,
        use_batch_stats=batch_stats is not None,
    )
    # latency-hiding scheduler: +2.4% measured on the full step (BENCH.md)
    from tpuwsi.core.compile import scheduled_step

    jit_step = scheduled_step(
        compile_step(step_fn, mesh, state, donate=False,
                     keep_state_sharding=tp)
    )
    jit_step_nomix = jit_step
    if mix_fn is not None and args.mixup_off_epoch:
        # timm --mixup-off-epoch: mixup/cutmix disabled from this epoch on —
        # a second compiled step without the mix stage, swapped at the epoch
        # boundary (timm_train.py:838-844 mixup_fn.mixup_enabled = False).
        nomix_fn = make_train_step(
            model.apply, tx, augment_fn=aug, loss_fn=loss_fn,
            ema_decay=args.model_ema_decay if args.model_ema else None,
            mix_fn=None,
            use_batch_stats=batch_stats is not None,
        )
        jit_step_nomix = scheduled_step(
            compile_step(nomix_fn, mesh, state, donate=False,
                         keep_state_sharding=tp)
        )

    # --steps-per-dispatch: the bench's K-step lax.scan driver,
    # productionized — one dispatch runs N optimizer steps over a stacked
    # (N, B, ...) super-batch (train/supervised.make_multi_step)
    jit_multi = jit_multi_nomix = None
    if args.steps_per_dispatch > 1:
        from tpuwsi.train.supervised import make_multi_step

        jit_multi = scheduled_step(
            compile_step(make_multi_step(step_fn), mesh, state, donate=False,
                         keep_state_sharding=tp)
        )
        jit_multi_nomix = jit_multi
        if mix_fn is not None and args.mixup_off_epoch:
            jit_multi_nomix = scheduled_step(
                compile_step(make_multi_step(nomix_fn), mesh, state,
                             donate=False, keep_state_sharding=tp)
            )

    if folder_mode and args.transform_type == "timm":
        from tpuwsi.preprocess.timm_aug import make_timm_eval

        eval_norm = make_timm_eval(
            img_size, crop_pct=args.crop_pct, mean=args.mean, std=args.std,
            interpolation=args.interpolation or _default_interp(args.model),
        )
    else:
        eval_norm = make_recipe(
            args.transform_type, train=False, tile_size=img_size,
            norm_type="Amir" if args.dataset.startswith("TMA") else "Ron",
        )
    eval_step = jax.jit(
        make_eval_step(
            model.apply,
            preprocess_fn=lambda im: eval_norm(jax.random.PRNGKey(0), im),
            # timm ranks checkpoints/summary on the EMA copy's metrics when
            # EMA is on (train.py:947-956: eval_metrics = ema_eval_metrics)
            use_ema=args.model_ema,
        )
    )

    if args.extract_features:
        return extract_features(args, model, state, eval_step, output_dir)

    # ---------------- epoch loop ----------------
    from tpuwsi.utils.tracking import Tracker

    tracker = Tracker(output_dir, use_wandb=args.log_wandb, config=vars(args))
    rng = jax.random.PRNGKey(args.seed)
    summary_path = os.path.join(output_dir, "summary.csv")
    # --start-epoch: manual offset, else resume's completed epochs, else 0
    start_epoch = args.start_epoch
    if start_epoch is None:
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
    try:
        with mesh:
            for epoch in range(start_epoch, args.epochs):
                # The epoch shuffle seed must be IDENTICAL on every host so the
                # process-strided slices of the index stream stay disjoint
                # (DistributedSampler semantics); per-host variation comes from
                # the disjoint slide draws themselves. host_seed_offset exists
                # for host-local streams that must NOT collide (e.g. worker
                # augmentation in a host-side pipeline).
                epoch_rng = np.random.default_rng(args.seed + epoch)
                if not folder_mode and args.RAM_saver and epoch > 0 and epoch % 100 == 0:
                    # RAM_saver: reshuffle the quarter-subset every 100 epochs
                    # (train.py:385, datasets.py:260-264)
                    table = load_slide_table(
                        args.dataset, tile_size=args.tile_size,
                        target_kind=args.target, test_fold=args.test_fold,
                        train=True, train_type="REG",
                        n_tiles=args.n_patches_train,
                        desired_magnification=args.mag, dx=args.dx,
                        er_eq_pr=args.er_eq_pr, ram_saver=True,
                        data_root=args.data_root, rng=epoch_rng,
                    )
                    sampler = WSITileSampler(
                        table, n_tiles=args.n_patches_train, bag_size=1,
                        num_threads=args.workers,
                        balanced_sampling=args.balanced_sampling,
                    )
                if folder_mode:
                    batches = train_ds.batches(
                        args.batch_size, rng=epoch_rng,
                        process_index=pindex, process_count=pcount,
                        repeats=max(args.aug_repeats, 1),
                    )
                else:
                    batches = sampler.batches(
                        epoch_rng, args.batch_size,
                        process_index=pindex, process_count=pcount,
                    )
                batches = Prefetcher(batches, depth=3)
                t0 = time.time()
                metrics = {}
                spd = max(args.steps_per_dispatch, 1)
                for i, chunk in _chunked_enumerate(batches, spd):
                    if args.max_steps_per_epoch:
                        if i >= args.max_steps_per_epoch:
                            break
                        # truncate so the bound is exact: an untruncated
                        # chunk would overshoot by up to spd-1 steps
                        chunk = chunk[: args.max_steps_per_epoch - i]
                    # i = first step index of this dispatch; j = last
                    j = i + len(chunk) - 1
                    batch = chunk[0]
                    if args.images and i == 0:
                        # -im parity (train.py:378, datasets.py:504-508): dump the
                        # un-augmented input tiles for manual QA (our batches are
                        # raw uint8 — augmentation runs on device afterwards).
                        save_batch_images(
                            batch["images"], batch.get("labels"),
                            os.path.join(output_dir, "images"),
                            f"epoch{epoch}_batch0.png",
                        )
                    if args.save_images and i == 0:
                        # --save-images parity (train.py:1114-1120): the
                        # POST-augmentation batch, min-max scaled to uint8 like
                        # torchvision save_image's normalize branch.
                        augd = np.asarray(
                            aug(jax.random.fold_in(rng, epoch),
                                jnp.asarray(batch["images"]))
                        )
                        lo, hi = float(augd.min()), float(augd.max())
                        save_batch_images(
                            ((augd - lo) / max(hi - lo, 1e-6) * 255).astype(
                                np.uint8
                            ),
                            batch.get("labels"),
                            os.path.join(output_dir, "images"),
                            f"epoch{epoch}_aug0.png",
                        )
                    nomix = (
                        args.mixup_off_epoch and epoch >= args.mixup_off_epoch
                    )
                    state, metrics = _run_chunk(
                        chunk, spd,
                        jit_step_nomix if nomix else jit_step,
                        jit_multi_nomix if nomix else jit_multi,
                        mesh, ("images", "labels"), state, rng,
                    )
                    if args.dispatch_ahead and _interval_hit(
                        i, j, args.dispatch_ahead
                    ):
                        float(metrics["loss"])  # bound device run-ahead
                    if args.log_interval and _interval_hit(
                        i, j, args.log_interval
                    ):
                        m = {k: float(v) for k, v in metrics.items()}
                        rate = (j + 1) * args.batch_size / (time.time() - t0)
                        logging.info(
                            "epoch %d step %d loss %.4f auc %.3f (%.1f tiles/s)",
                            epoch, j, m.get("loss", 0), m.get("auc", 0.5), rate,
                        )
                        tracker.log({**m, "rate": rate}, step=int(state.step))
                    if ckpt_rec is not None and _interval_hit(
                        max(i, 1), j, max(args.recovery_interval, 1)
                    ):
                        ckpt_rec.save(int(state.step), state, {"recovery": 1.0})
                train_metrics = {k: float(v) for k, v in metrics.items()}
                # timm update_summary logs the epoch's lr column (train.py:963)
                train_metrics["lr"] = float(
                    schedule(int(state.step) - sched_count_offset)
                )
                if args.time and not folder_mode:
                    # -time parity (datasets.py:512-526): per-stage pipeline times
                    td = sampler.stage_timer.time_dict()
                    logging.info("epoch %d time dict: %s", epoch, td)
                    tracker.log(
                        {"extract_tile_sec": td["Average time to extract a tile"]},
                        step=int(state.step),
                    )

                eval_metrics = {}
                if (
                    (epoch % args.eval_rate == 0 or epoch == args.epochs - 1)
                    and folder_mode
                    and val_ds is not None
                    and len(val_ds) > 0
                ):
                    # folder-mode per-epoch validation: top-1/top-5/loss (+ AUC
                    # for binary) — timm_train.py:951-1025 validate() parity.
                    eval_metrics = evaluate_folder(
                        val_ds, state, eval_step,
                        args.validation_batch_size or args.batch_size,
                        dispatch_ahead=args.dispatch_ahead,
                        steps_per_dispatch=args.eval_steps_per_dispatch,
                    )
                    logging.info("epoch %d folder eval: %s", epoch, eval_metrics)
                    tracker.log(
                        {f"eval_{k}": v for k, v in eval_metrics.items()},
                        step=int(state.step),
                    )
                if (epoch % args.eval_rate == 0 or epoch == args.epochs - 1) and not folder_mode:
                    eval_metrics, agg = evaluate_slides(args, state, eval_step)
                    logging.info("epoch %d eval: %s", epoch, eval_metrics)
                    if agg is not None and agg.results:
                        # per-interval ROC/PR curve logging (train.py:1122-1127)
                        tracker.log_roc_pr(
                            [r.slide_score for r in agg.results],
                            [r.label for r in agg.results],
                            prefix="eval_slide_", step=int(state.step),
                        )
                        if args.bootstrap:
                            bmean, bstd = agg.bootstrap_slide_auc()
                            eval_metrics["auc_bootstrap_mean"] = bmean
                            eval_metrics["auc_bootstrap_std"] = bstd
                    tracker.log(
                        {f"eval_{k}": v for k, v in eval_metrics.items()},
                        step=int(state.step),
                    )
                if (plateau is not None
                        and eval_metrics.get(args.eval_metric) is not None):
                    new_scale = plateau.step(
                        float(eval_metrics[args.eval_metric])
                    )
                    if new_scale is not None:
                        from tpuwsi.train.optim import set_plateau_scale

                        state = state.replace(opt_state=set_plateau_scale(
                            state.opt_state, new_scale))
                        logging.info("plateau: LR scale -> %.4g", new_scale)
                ckpt.save(int(state.step), state,
                          eval_metrics or {args.eval_metric: 0.0})
                update_summary(epoch, train_metrics, eval_metrics, summary_path)
                ledger.update(exp["Experiment"], **{"Last Epoch": epoch})
                if eval_metrics.get("auc") is not None:
                    ledger.update(
                        exp["Experiment"],
                        **{"TestSet Mean AUC": eval_metrics["auc"]},
                    )
    except KeyboardInterrupt:
        # graceful finish on Ctrl-C (train.py:979-980): fall through to
        # checkpoint finalization + tracker close with the last state
        logging.info("KeyboardInterrupt — finishing gracefully")
    ckpt.close()
    if ckpt_rec is not None:
        ckpt_rec.close()
    tracker.finish()
    return state


def _chunked_enumerate(iterable, n: int):
    """Yield (first_step_index, [up to n batches]) — the host-side grouping
    for --steps-per-dispatch super-batches.

    Closes a closeable source (the Prefetcher) on exit — including the
    consumer breaking early (--max-steps-per-epoch), where an unclosed
    producer thread would stay parked on the full queue for the rest of the
    run (one leaked thread per epoch)."""
    try:
        buf, start = [], 0
        for b in iterable:
            buf.append(b)
            if len(buf) == n:
                yield start, buf
                start += n
                buf = []
        if buf:
            yield start, buf
    finally:
        close = getattr(iterable, "close", None)
        if close is not None:
            close()


def _interval_hit(i: int, j: int, n: int) -> bool:
    """True iff some step index k in [i, j] has k % n == 0 — the chunked
    generalization of the per-step ``i % n == 0`` triggers (identical when
    i == j)."""
    if n <= 0:
        return False
    return True if i <= 0 else (j // n) > ((i - 1) // n)


def _run_chunk(chunk, spd, jit_step, jit_multi, mesh, keys, state, rng):
    """Dispatch one --steps-per-dispatch chunk: the scanned super-batch when
    the chunk is full, per-step jits for ragged tails (shared by the
    supervised, SSL, and survival loops — keep the dispatch semantics in ONE
    place)."""
    from tpuwsi.core.mesh import shard_batch

    metrics = {}
    if len(chunk) < spd or spd == 1:
        for b in chunk:
            sb = shard_batch(mesh, {k: b[k] for k in keys})
            state, metrics = jit_step(state, sb, rng)
    else:
        stacked = {k: np.stack([b[k] for b in chunk]) for k in keys}
        sb = shard_batch(mesh, stacked, batch_axis=1)
        state, metrics = jit_multi(state, sb, rng)
    return state, metrics


def _scanned_eval_for(step_fn):
    """Scanned-eval wrapper memoized ON the step function itself: a fresh
    jax.jit wrapper per epoch would retrace every eval pass, and a
    module-level cache held every run's closures + compiled executables
    for process lifetime (advisor round-4; a WeakKeyDictionary does not
    help — the scanned closure strongly references its key, so entries
    never die). Stashing on the step object (setattr works on both plain
    functions and PjitFunction) ties the executable's lifetime to the
    run's own step function; the step→scanned→step cycle is ordinary
    cycle-collector fodder once the run drops the step."""
    scanned = getattr(step_fn, "_tpuwsi_scanned_eval", None)
    if scanned is None:
        from tpuwsi.train.supervised import make_multi_eval_step

        scanned = jax.jit(make_multi_eval_step(step_fn))
        step_fn._tpuwsi_scanned_eval = scanned
    return scanned


def _serving_stream(chunks, state, eval_step, k, depth,
                    images_of=lambda c: c.images):
    """(chunk, (logits, probs)) host stream for the serving loops.

    k=1: one dispatch per chunk (round-3 behavior). k>1: one lax.scan'd
    dispatch per k chunks (--eval-steps-per-dispatch;
    infer/pipeline.eval_stream + train.supervised.make_multi_eval_step).
    State rides as an ARGUMENT of the jitted scan — never a closure — so a
    fresh state each epoch is picked up without retracing."""
    import jax.numpy as jnp

    from tpuwsi.infer.pipeline import eval_stream

    multi = None
    if k > 1:
        scanned = _scanned_eval_for(eval_step)
        multi = lambda ims: scanned(state, {"images": jnp.asarray(ims)})
    # threaded decode-ahead: tile reads proceed while the consumer blocks
    # in device fetches (the training loops' Prefetcher, serving-side)
    from tpuwsi.io.wsi import Prefetcher

    pf = Prefetcher(iter(chunks), depth=2)
    try:
        yield from eval_stream(
            pf, images_of,
            lambda im: eval_step(state, {"images": jnp.asarray(im)}),
            multi_call=multi, k=k, depth=depth,
        )
    finally:
        pf.close()


def evaluate_folder(val_ds, state, eval_step, batch_size: int,
                    dispatch_ahead: int = 2, steps_per_dispatch: int = 1):
    """Folder-mode validation (timm_train.py:951-1025): top-1/top-5 accuracy
    and mean CE loss over the val set; binary AUC when there are 2 classes."""
    import jax.numpy as jnp

    from tpuwsi.infer.aggregate import roc_auc

    n_correct1 = n_correct5 = n_total = 0
    loss_sum = 0.0
    all_scores, all_labels = [], []

    stream = _serving_stream(
        val_ds.batches(batch_size, shuffle=False, drop_last=False),
        state, eval_step, steps_per_dispatch, dispatch_ahead,
        images_of=lambda b: b["images"],
    )
    for batch, (logits, probs) in stream:
        labels = batch["labels"]
        logits = np.asarray(logits, dtype=np.float32)
        probs = np.asarray(probs)
        k = min(5, logits.shape[-1])
        topk = np.argsort(-logits, axis=-1)[:, :k]
        n_correct1 += int((topk[:, 0] == labels).sum())
        n_correct5 += int((topk == labels[:, None]).any(axis=1).sum())
        n_total += len(labels)
        logz = logits - logits.max(axis=-1, keepdims=True)
        logp = logz - np.log(np.exp(logz).sum(axis=-1, keepdims=True))
        loss_sum += float(-logp[np.arange(len(labels)), labels].sum())
        if probs.shape[-1] == 2:
            all_scores.extend(probs[:, 1].tolist())
            all_labels.extend(labels.tolist())
    if n_total == 0:
        return {}
    metrics = {
        "top1": n_correct1 / n_total,
        "top5": n_correct5 / n_total,
        "loss": loss_sum / n_total,
    }
    if all_scores:
        metrics["auc"] = roc_auc(all_scores, all_labels)
    return metrics


def evaluate_slides(args, state, eval_step):
    """Slide-level validation (train.py:1146-1345): walk the test-fold
    slides, mean-softmax per slide, per-patch and per-slide AUC."""
    import jax.numpy as jnp

    from tpuwsi.infer import SlideAggregator, SlideWalker
    from tpuwsi.io.metadata import load_slide_table

    table = load_slide_table(
        args.dataset,
        tile_size=args.tile_size,
        target_kind=args.target,
        test_fold=args.test_fold,
        train=False,
        train_type="Infer",
        infer_folds=[args.test_fold],
        desired_magnification=args.mag,
        data_root=args.data_root,
    )
    walker = SlideWalker(
        table, tiles_per_iter=args.tiles_per_iter, num_tiles=args.n_patches_test
    )
    names = args.target.split("+")
    if len(names) > 1:
        # multi-target: one aggregator per 2-class head; per-target slide/
        # patch AUCs plus their mean as the ranking metric
        aggs = [SlideAggregator() for _ in names]

        stream = _serving_stream(
            walker.walk(), state, eval_step,
            args.eval_steps_per_dispatch, args.dispatch_ahead,
        )
        for chunk, (logits, _probs) in stream:
            logits = np.asarray(logits, dtype=np.float32)
            for t, a in enumerate(aggs):
                lab = int(np.asarray(chunk.label).ravel()[t])
                if lab < 0:
                    # unknown target for this head ('Missing Data' → -1,
                    # utils.py:770): the table keeps a slide if ANY target is
                    # known — feeding -1 labels into roc_auc inflates the
                    # rank sums (training masks them; eval must too)
                    continue
                lt = logits[:, 2 * t : 2 * t + 2]
                e = np.exp(lt - lt.max(axis=-1, keepdims=True))
                pt = e / e.sum(axis=-1, keepdims=True)
                a.add_chunk(dataclasses.replace(chunk, label=lab), pt)
        if not any(a.results for a in aggs):
            return {}, None
        metrics = {}
        scored = []
        for name, a in zip(names, aggs):
            if not a.results:
                continue  # every slide had -1 for this head
            metrics[f"auc_{name}"] = a.slide_auc()
            metrics[f"patch_auc_{name}"] = a.patch_auc()
            scored.append(name)
        metrics["auc"] = float(np.mean([metrics[f"auc_{n}"] for n in scored]))
        metrics["patch_auc"] = float(
            np.mean([metrics[f"patch_auc_{n}"] for n in scored])
        )
        return metrics, next(a for a in aggs if a.results)
    agg = SlideAggregator()

    # dispatch-ahead pipelining (infer/pipeline.py): device computes chunk i
    # while the host decodes chunk i+1 and fetches chunk i-depth; with
    # --eval-steps-per-dispatch > 1 each dispatch scans k chunks on-device
    for chunk, (_logits, probs) in _serving_stream(
        walker.walk(), state, eval_step,
        args.eval_steps_per_dispatch, args.dispatch_ahead,
    ):
        agg.add_chunk(chunk, probs)
    if not agg.results:
        return {}, None
    return {"auc": agg.slide_auc(), "patch_auc": agg.patch_auc()}, agg


def extract_features(args, model, state, eval_step, output_dir):
    """--extract_features (train.py:1281-1282): 384-dim tile features +
    reference-format inference .data file for the MIL pipeline."""
    import jax.numpy as jnp

    from tpuwsi.infer import SlideAggregator, SlideWalker
    from tpuwsi.io.metadata import load_slide_table
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess import make_recipe

    table = load_slide_table(
        args.dataset,
        tile_size=args.tile_size,
        target_kind=args.target,
        test_fold=args.test_fold,
        train=False,
        train_type="Infer",
        infer_folds=[args.test_fold],
        desired_magnification=args.mag,
        data_root=args.data_root,
    )
    img_size = args.img_size or args.tile_size
    quantize = getattr(args, "quantize", "none") == "int8"
    feat_model = create_model(
        args.model, num_classes=0, img_size=img_size,
        use_pallas_attention=jax.default_backend() == "tpu",
        quant_int8=quantize,
    )
    # Same norm bank as the caller's eval_step (TMA cohorts use the Amir
    # bank): keeps the single-forward probs bit-identical to eval_step's,
    # and the saved features normalized consistently with them.
    norm = make_recipe(
        "none", train=False, tile_size=img_size,
        norm_type="Amir" if args.dataset.startswith("TMA") else "Ron",
    )

    # head params present in state.params are ignored by the num_classes=0 view
    import jax as _jax

    @_jax.jit
    def feat_step(params, images):
        x = norm(_jax.random.PRNGKey(0), images)
        feats = feat_model.apply(params, x)
        return feats

    walker = SlideWalker(
        table, tiles_per_iter=args.tiles_per_iter, num_tiles=args.num_tiles
    )
    agg = SlideAggregator(extract_features=True)
    feat_params = _strip_head(state.params)
    if quantize:
        # one-shot post-training quantization of the checkpoint weights —
        # the serving loop then reads only int8 kernels (ops/quant.py)
        from tpuwsi.ops.quant import quantize_vit_params

        feat_params = quantize_vit_params(feat_params)

    # ONE backbone forward per chunk (reference parity: train.py:1281-1332
    # reads features and logits from a single model forward). Every zoo
    # classifier is a plain f32 Dense on the pooled/cls features (ViT
    # 'head', ResNet 'fc', EfficientNet 'classifier'), so
    # logits = feats @ W + b reproduces eval_step's logits exactly while
    # halving the extraction compute. Fallback to the two-forward path when
    # no head Dense is found, under --quantize int8 (probs must come from
    # the f32 model the accuracy pin was measured against), or under
    # --model-ema (eval_step scores the EMA copy; the feature pass reads
    # the raw params — one forward can't serve both).
    use_ema_eval = args.model_ema and state.ema_params is not None
    head_kb = _find_head_dense(state.params)
    if head_kb is not None and not quantize and not use_ema_eval:
        w_h, b_h = head_kb

        @_jax.jit
        def feat_probs_step(params, images):
            x = norm(_jax.random.PRNGKey(0), images)
            feats = feat_model.apply(params, x)
            logits = feats.astype(jnp.float32) @ w_h + b_h
            return _jax.nn.softmax(logits, axis=-1), feats

        from tpuwsi.infer.pipeline import eval_stream
        from tpuwsi.train.supervised import make_multi_eval_step

        k = args.eval_steps_per_dispatch
        multi = None
        if k > 1:
            scanned_fp = _jax.jit(make_multi_eval_step(feat_probs_step))
            multi = lambda ims: scanned_fp(feat_params, jnp.asarray(ims))

        def make_stream(chunks):
            return eval_stream(
                chunks, lambda c: c.images,
                lambda im: feat_probs_step(feat_params, jnp.asarray(im)),
                multi_call=multi, k=k, depth=args.dispatch_ahead,
            )
    else:
        def make_stream(chunks):
            def _dispatch_feats():
                for chunk in chunks:
                    images = jnp.asarray(chunk.images)
                    _, probs = eval_step(state, {"images": images})
                    feats = feat_step(feat_params, images)
                    yield chunk, (probs, feats)

            return pipelined_fetch(
                _dispatch_feats(), depth=args.dispatch_ahead)

    from tpuwsi.io.wsi import Prefetcher

    pf = Prefetcher(walker.walk(), depth=2)
    try:
        for chunk, (probs, feats) in make_stream(pf):
            agg.add_chunk(chunk, probs, feats)
    finally:
        pf.close()
    feat_dir = os.path.join(output_dir, "features")
    agg.save_features_pt(feat_dir)
    agg.save_inference_data(os.path.join(feat_dir, "inference.data"))
    logging.info("features for %d slides → %s", len(agg.results), feat_dir)
    return agg


def _find_head_dense(params):
    """Locate the final classifier Dense (kernel, bias) in a param tree.

    Every zoo family ends in one plain f32 Dense on the pooled/cls
    features — ViT names it 'head' (models/vit.py), ResNet 'fc'
    (models/resnet_trunc.py), EfficientNet 'classifier'
    (models/efficientnet.py). Returns (kernel, bias) or None."""
    import flax
    import jax.numpy as jnp
    import numpy as np

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    for name in ("head", "fc", "classifier"):
        kk = ("params", name, "kernel")
        if kk in flat:
            kernel = jnp.asarray(flat[kk])
            bias = flat.get(("params", name, "bias"))
            if bias is None:
                bias = np.zeros((kernel.shape[-1],), np.float32)
            return kernel, jnp.asarray(bias)
    return None


def _strip_head(params):
    """Drop the classifier head params so the num_classes=0 module matches."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    flat = {k: v for k, v in flat.items() if "head" not in k}
    return flax.traverse_util.unflatten_dict(flat)


def train_survival(args, output_dir, ledger, exp):
    """Survival-target training (-tar Survival_Time / Survival_Binary — the
    reference's DEFAULT, train.py:370; datasets.py:2354-3461).

    Survival_Time → Cox partial-likelihood risk regression (1-output head);
    Survival_Binary → masked CE on the 5-year status (2-way head). Eval every
    --eval_rate epochs walks the test-fold slides with SurvivalSlideWalker
    and records slide-level C-index (+ binary AUC) in summary.csv.
    """
    import jax.numpy as jnp

    from tpuwsi.core.mesh import shard_batch
    from tpuwsi.infer.survival_walker import (
        SurvivalAggregator,
        SurvivalSlideWalker,
    )
    from tpuwsi.io.survival import load_survival_slide_table, survival_batches
    from tpuwsi.io.wsi import Prefetcher, WSITileSampler
    from tpuwsi.models.registry import create_model
    from tpuwsi.preprocess import make_recipe
    from tpuwsi.train import (
        CheckpointManager,
        OptimConfig,
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from tpuwsi.train.survival import make_survival_train_step
    from tpuwsi.utils import update_summary

    from tpuwsi.core.distributed import initialize_multihost

    pindex, pcount = initialize_multihost()
    mode = "cox" if args.target == "Survival_Time" else "binary"
    table = load_survival_slide_table(
        args.dataset,
        tile_size=args.tile_size,
        test_fold=args.test_fold,
        train=True,
        train_type="REG",
        n_tiles=args.n_patches_train,
        desired_magnification=args.mag,
        censor_balance=args.balanced_dataset,
        data_root=args.data_root,
    )
    sampler = WSITileSampler(
        table, n_tiles=args.n_patches_train, bag_size=1,
        num_threads=args.workers, print_timing=args.time,
    )
    steps_per_epoch = max(len(sampler) // (args.batch_size * pcount), 1)

    on_tpu = jax.default_backend() == "tpu"
    img_size = args.img_size or args.tile_size
    num_classes = 1 if mode == "cox" else 2
    model = create_model(
        args.model, num_classes=num_classes, drop_rate=args.drop,
        drop_path_rate=args.drop_path or 0.0, img_size=img_size,
        use_pallas_attention=on_tpu,
        grad_checkpointing=args.grad_checkpointing,
        # same single-view training shape as the supervised step — the
        # saved-probs backward A/B (scripts/exp_sup4.py) applies here too
        attn_save_probs=on_tpu,
    )
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
    )
    ocfg = OptimConfig(
        opt=args.opt, lr=args.lr, base_lr=args.lr_base,
        lr_base_size=args.lr_base_size,
        momentum=args.momentum, weight_decay=args.weight_decay,
        clip_grad=args.clip_grad, clip_mode=args.clip_mode,
        sched=args.sched, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        min_lr=args.min_lr, steps_per_epoch=steps_per_epoch,
        decay_epochs=args.decay_epochs, decay_rate=args.decay_rate,
        layer_decay=args.layer_decay,
        **_opt_extra_kwargs(args),
    )
    global_batch = args.batch_size * pcount
    mesh = _fitting_mesh(global_batch, args.model_parallel)
    if args.model_parallel > 1:
        from tpuwsi.parallel.sharding import shard_params

        params = shard_params(mesh, params)
    tx, _ = make_optimizer(ocfg, params, global_batch)
    if args.no_grad:
        from tpuwsi.train.optim import freeze_non_head

        tx = freeze_non_head(tx, params)
    state = create_train_state(params, tx)
    metric_name = "c_index" if mode == "cox" else "auc"
    ckpt = CheckpointManager(
        os.path.join(output_dir, "checkpoints"),
        max_history=args.checkpoint_hist, metric_name=metric_name,
    )
    ckpt_rec = (
        CheckpointManager(
            os.path.join(output_dir, "checkpoints", "recovery"),
            max_history=2, rank_by_metric=False,
        )
        if args.recovery_interval else None
    )
    if args.resume:
        restored = load_checkpoint(args.resume, target=state)
        if restored is not None:
            state = restored

    aug = make_recipe(
        args.transform_type, train=True, tile_size=img_size,
        color_param=args.c_param, norm_type="Ron",
    )
    step_fn = make_survival_train_step(model.apply, tx, mode=mode, augment_fn=aug)
    from tpuwsi.core.compile import scheduled_step

    jit_step = scheduled_step(jax.jit(step_fn))
    jit_multi = None
    if args.steps_per_dispatch > 1:
        from tpuwsi.train.supervised import make_multi_step

        jit_multi = scheduled_step(jax.jit(make_multi_step(step_fn)))

    eval_norm = make_recipe(
        args.transform_type, train=False, tile_size=img_size, norm_type="Ron"
    )

    @jax.jit
    def risk_fn(params, images):
        x = eval_norm(jax.random.PRNGKey(0), images)
        out = model.apply(params, x)
        if mode == "cox":
            return out[:, 0] if out.ndim > 1 else out
        # binary: risk = logit margin toward the "not survived" class
        return out[:, 0] - out[:, 1]

    summary_path = os.path.join(output_dir, "summary.csv")
    rng = jax.random.PRNGKey(args.seed)
    # eval-side slide table + walker are epoch-invariant — build once, not
    # per eval epoch (the table load merges multi-thousand-row cohort xlsx)
    infer_table = load_survival_slide_table(
        args.dataset, tile_size=args.tile_size,
        test_fold=args.test_fold, train=False, train_type="Infer",
        infer_folds=[args.test_fold], bag_size=0,
        desired_magnification=args.mag, data_root=args.data_root,
    )
    walker = SurvivalSlideWalker(
        infer_table, tiles_per_iter=args.tiles_per_iter,
        num_tiles=args.n_patches_test,
    )
    with mesh:
        for epoch in range(args.epochs):
            epoch_rng = np.random.default_rng(args.seed + epoch)
            batches = survival_batches(
                sampler, epoch_rng, args.batch_size,
                process_index=pindex, process_count=pcount,
            )
            metrics = {}
            spd = max(args.steps_per_dispatch, 1)
            keys = ("images", "binary_targets", "time_targets", "censored")
            for i, chunk in _chunked_enumerate(
                Prefetcher(batches, depth=3), spd
            ):
                if args.max_steps_per_epoch:
                    if i >= args.max_steps_per_epoch:
                        break
                    chunk = chunk[: args.max_steps_per_epoch - i]
                j = i + len(chunk) - 1
                state, metrics = _run_chunk(
                    chunk, spd, jit_step, jit_multi, mesh, keys, state, rng
                )
                if args.dispatch_ahead and _interval_hit(
                    i, j, args.dispatch_ahead
                ):
                    float(metrics["loss"])
                if args.log_interval and _interval_hit(i, j, args.log_interval):
                    m = {k: float(v) for k, v in metrics.items()}
                    logging.info(
                        "survival(%s) epoch %d step %d loss %.4f %s %.3f",
                        mode, epoch, j, m.get("loss", 0.0), metric_name,
                        m.get(metric_name, 0.5),
                    )
                if ckpt_rec is not None and _interval_hit(
                    max(i, 1), j, max(args.recovery_interval, 1)
                ):
                    # recovery checkpoints (train.py:322-323,1130-1132) —
                    # previously only the supervised loop saved them
                    ckpt_rec.save(int(state.step), state, {"recovery": 1.0})
            train_metrics = {k: float(v) for k, v in metrics.items()}

            eval_metrics = {}
            if epoch % args.eval_rate == 0 or epoch == args.epochs - 1:
                agg = SurvivalAggregator()

                from tpuwsi.infer.pipeline import eval_stream

                k_ev = args.eval_steps_per_dispatch
                multi = None
                if k_ev > 1:
                    scanned_r = _scanned_eval_for(risk_fn)
                    params_now = state.params
                    multi = lambda ims: scanned_r(
                        params_now, jnp.asarray(ims))
                params_s = state.params
                pf_s = Prefetcher(walker.walk(), depth=2)
                try:
                    for chunk, risks in eval_stream(
                        pf_s, lambda c: c.images,
                        lambda im: risk_fn(params_s, jnp.asarray(im)),
                        multi_call=multi, k=k_ev,
                        depth=args.dispatch_ahead,
                    ):
                        agg.add_chunk(chunk, risks)
                finally:
                    pf_s.close()
                if agg.results:
                    eval_metrics = {"c_index": agg.slide_c_index()}
                    try:
                        eval_metrics["auc"] = agg.slide_binary_auc()
                    except Exception:
                        pass
                    logging.info("survival epoch %d eval: %s", epoch, eval_metrics)
            ckpt.save(int(state.step), state,
                      eval_metrics or {metric_name: 0.0})
            update_summary(epoch, train_metrics, eval_metrics, summary_path)
            ledger.update(exp["Experiment"], **{"Last Epoch": epoch})
    ckpt.close()
    if ckpt_rec is not None:
        ckpt_rec.close()
    return state


def ssl_backbone_config(args, on_tpu: bool):
    """The ViTConfig the SSL loop trains — tuned TPU defaults included.

    Module-level (not inlined in train_ssl) so tests can pin it to the exact
    configuration bench.py measures (core/tuned.py is the shared source;
    round-3 VERDICT item 1: users must get the recorded-benchmark step)."""
    from tpuwsi.core.tuned import tuned_vit_kwargs
    from tpuwsi.models.registry import parse_model_name

    return dataclasses.replace(
        parse_model_name(args.model),
        num_classes=0,
        img_size=args.dino_global_size,
        # DINO recipe default 0.1; an EXPLICIT --drop-path 0 must win
        # (`or` would silently re-enable stochastic depth)
        drop_path_rate=0.1 if args.drop_path is None else args.drop_path,
        gelu_approx=True,  # from-scratch SSL: no checkpoint parity constraint
        # NOTE: scan_blocks is deliberately NOT tied to remat — it would
        # change the checkpoint param-tree layout (blocks_i vs stacked
        # blocks_scan) and break resume across a memory-only toggle.
        remat_blocks=args.grad_checkpointing,
        **tuned_vit_kwargs(on_tpu),
    )


def ssl_multicrop_config(args, on_tpu: bool):
    """The MultiCropConfig the SSL loop trains (bf16 aug on TPU)."""
    from tpuwsi.core.tuned import tuned_multicrop_kwargs
    from tpuwsi.preprocess.multicrop import MultiCropConfig

    return MultiCropConfig(
        global_size=args.dino_global_size,
        local_size=args.dino_local_size,
        n_local=args.dino_local_crops,
        **tuned_multicrop_kwargs(on_tpu),
    )


def ssl_step_bundle(args, steps_per_epoch, global_batch, on_tpu=None,
                    vit_overrides=None, shard_fn=None):
    """Assemble the production DINO SSL step from parsed args.

    Both ``train_ssl`` and the headline benchmark (bench.py) build through
    this one function, so the recorded benchmark measures the LITERAL
    program the CLI trains — including the pieces a config-level pin
    misses (global-norm grad clipping at 3.0, drop-path 0.1, the
    warmup-cosine LR schedule). Round-3 VERDICT item 1: the physical
    CLI-loop rate check is upload-bandwidth-bound on the tunneled bench
    host (40 MB/s vs the 184 MB/s the step consumes — BENCH.md), so the
    bench/CLI step identity is pinned structurally here instead.

    ``vit_overrides`` patches the ViTConfig (the exp_* A/B scripts measure
    deltas against the exact adopted configuration); ``shard_fn`` is
    applied to the freshly initialized params (model-parallel layout).
    """
    import types

    import jax.numpy as jnp

    from tpuwsi.core.tuned import tuned_dino_kwargs, tuned_head_kwargs
    from tpuwsi.models import DINOHead
    from tpuwsi.models.vit import VisionTransformer
    from tpuwsi.preprocess.multicrop import make_multicrop
    from tpuwsi.ssl_dino import (
        DINOConfig,
        DINOModel,
        create_dino_state,
        make_dino_train_step,
    )
    from tpuwsi.train import OptimConfig, make_optimizer

    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    cfg = ssl_backbone_config(args, on_tpu)
    if vit_overrides:
        cfg = dataclasses.replace(cfg, **vit_overrides)
    model = DINOModel(
        backbone=VisionTransformer(cfg),
        head=DINOHead(out_dim=args.dino_out_dim, gelu_approx=True,
                      **tuned_head_kwargs(on_tpu)),
    )
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.dino_global_size, args.dino_global_size, 3)),
    )
    if shard_fn is not None:
        params = shard_fn(params)
    total_steps = args.epochs * steps_per_epoch
    dcfg = DINOConfig(
        out_dim=args.dino_out_dim,
        n_local=args.dino_local_crops,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp=args.warmup_teacher_temp,
        warmup_teacher_temp_steps=args.warmup_teacher_temp_epochs * steps_per_epoch,
        ema_base=args.ema_base,
        total_steps=total_steps,
        **tuned_dino_kwargs(on_tpu),
    )
    ocfg = OptimConfig(
        opt=args.opt if args.opt != "sgd" else "adamw",
        lr=args.lr,
        base_lr=args.lr_base,
        lr_base_scale="sqrt",
        weight_decay=args.weight_decay,
        sched=args.sched,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        steps_per_epoch=steps_per_epoch,
        clip_grad=args.clip_grad or 3.0,
        clip_mode=args.clip_mode,
        decay_epochs=args.decay_epochs, decay_rate=args.decay_rate,
        **_opt_extra_kwargs(args),
    )
    tx, _ = make_optimizer(ocfg, params, global_batch)
    state = create_dino_state(params, tx, dcfg)
    mc = make_multicrop(ssl_multicrop_config(args, on_tpu))
    raw_step = make_dino_train_step(model.apply, tx, dcfg, multicrop_fn=mc)
    return types.SimpleNamespace(
        model=model, params=params, dcfg=dcfg, ocfg=ocfg, tx=tx,
        multicrop=mc, raw_step=raw_step, state=state,
    )


def train_ssl(args, output_dir):
    """DINO student/teacher SSL loop (the BASELINE north-star recipe)."""
    import jax.numpy as jnp

    from tpuwsi.core.mesh import MeshConfig, create_mesh, shard_batch
    from tpuwsi.io.folder import ImageFolderDataset
    from tpuwsi.io.metadata import load_slide_table
    from tpuwsi.io.wsi import Prefetcher, WSITileSampler
    from tpuwsi.train import CheckpointManager

    from tpuwsi.core.distributed import initialize_multihost

    pindex, pcount = initialize_multihost()
    folder_mode = bool(args.data_dir)
    if args.knn_eval_rate and not folder_mode:
        raise SystemExit(
            "--knn-eval-rate needs folder-mode labels (--data-dir); "
            "the WSI SSL stream is unlabeled"
        )
    if folder_mode:
        ds = ImageFolderDataset(args.data_dir)
        # per-host steps: each host sees a 1/pcount strided slice
        steps_per_epoch = max(len(ds) // (args.batch_size * pcount), 1)
    else:
        table = load_slide_table(
            args.dataset, tile_size=args.tile_size, target_kind=args.target,
            test_fold=args.test_fold, train=True, train_type="REG",
            n_tiles=args.n_patches_train, desired_magnification=args.mag,
            data_root=args.data_root,
        )
        sampler = WSITileSampler(
            table, n_tiles=args.n_patches_train, bag_size=1,
            num_threads=args.workers,
        )
        steps_per_epoch = max(len(sampler) // (args.batch_size * pcount), 1)

    global_batch = args.batch_size * pcount
    mesh = _fitting_mesh(global_batch, args.model_parallel)
    shard_fn = None
    if args.model_parallel > 1:
        from tpuwsi.parallel.sharding import shard_params

        shard_fn = lambda p: shard_params(mesh, p)  # noqa: E731
    bundle = ssl_step_bundle(args, steps_per_epoch, global_batch,
                             shard_fn=shard_fn)
    tx, state = bundle.tx, bundle.state
    from tpuwsi.core.compile import scheduled_step

    raw_step = bundle.raw_step
    step = scheduled_step(jax.jit(raw_step))
    multi_step = None
    if args.steps_per_dispatch > 1:
        # the bench.py K-step scan driver as the production SSL loop
        from tpuwsi.train.supervised import make_multi_step

        multi_step = scheduled_step(jax.jit(make_multi_step(raw_step)))
    ckpt = CheckpointManager(
        os.path.join(output_dir, "checkpoints"), metric_name="loss", mode="min"
    )

    knn_probe = None
    if args.knn_eval_rate:
        knn_probe = _make_ssl_knn_probe(args, bundle, ds)

    rng = jax.random.PRNGKey(args.seed)
    with mesh:
        for epoch in range(args.epochs):
            # same seed on every host: the process-strided batch slices must
            # come from one shared shuffle (DistributedSampler semantics)
            epoch_rng = np.random.default_rng(args.seed + epoch)
            batches = (
                ds.batches(args.batch_size, rng=epoch_rng,
                           process_index=pindex, process_count=pcount)
                if folder_mode
                else sampler.batches(epoch_rng, args.batch_size,
                                     process_index=pindex,
                                     process_count=pcount)
            )
            metrics = {}
            spd = max(args.steps_per_dispatch, 1)
            for i, chunk in _chunked_enumerate(Prefetcher(batches, depth=3), spd):
                if args.max_steps_per_epoch:
                    if i >= args.max_steps_per_epoch:
                        break
                    chunk = chunk[: args.max_steps_per_epoch - i]
                j = i + len(chunk) - 1
                state, metrics = _run_chunk(
                    chunk, spd, step, multi_step, mesh, ("images",), state, rng
                )
                if args.dispatch_ahead and _interval_hit(
                    i, j, args.dispatch_ahead
                ):
                    float(metrics["loss"])  # bound device run-ahead
                if args.log_interval and _interval_hit(i, j, args.log_interval):
                    logging.info(
                        "ssl epoch %d step %d loss %.4f momentum %.5f",
                        epoch, j, float(metrics["loss"]),
                        float(metrics["ema_momentum"]),
                    )
            epoch_metrics = {"loss": float(metrics.get("loss", 0.0))}
            if knn_probe and (epoch + 1) % args.knn_eval_rate == 0:
                epoch_metrics["knn_acc"] = knn_probe(state)
                logging.info("ssl epoch %d knn@20 acc %.4f",
                             epoch, epoch_metrics["knn_acc"])
            ckpt.save(int(state.step), state, epoch_metrics)
            if knn_probe:
                from tpuwsi.utils import update_summary

                update_summary(
                    epoch, {"loss": epoch_metrics["loss"]},
                    {"knn_acc": epoch_metrics.get("knn_acc", float("nan"))},
                    os.path.join(output_dir, "summary.csv"),
                    write_header=epoch == 0,
                )
    ckpt.close()
    return state


def _make_ssl_knn_probe(args, bundle, ds):
    """DINO kNN probe over the teacher's CLS features (the standard SSL
    eval the reference lacks — DINO eval_knn protocol, k=20): deterministic
    80/20 stride split of the labeled folder, center-crop to the global
    view size, training normalization bank."""
    import jax.numpy as jnp

    from tpuwsi.preprocess.normalize import normalize
    from tpuwsi.ssl_dino import knn_accuracy

    idx = np.arange(len(ds))
    te = idx[::5]
    tr = np.setdiff1d(idx, te)
    labels = np.asarray([ds.samples[i][1] for i in idx], np.int64)
    g = args.dino_global_size
    backbone = bundle.model.backbone

    def _crop(img):
        h, w = img.shape[:2]
        if h < g or w < g:  # tiny probe images: resize up via PIL path
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((g, g)), dtype=np.uint8)
            return img
        y0, x0 = (h - g) // 2, (w - g) // 2
        return img[y0:y0 + g, x0:x0 + g]

    crops = np.stack([_crop(ds.load(int(i))) for i in idx])

    @jax.jit
    def feats_fn(params, imgs):
        x = normalize(imgs.astype(jnp.float32) / 255.0, "Ron")
        return backbone.apply(params, x, deterministic=True)

    def probe(state):
        params = {"params": state.teacher_params["params"]["backbone"]}
        feats = []
        b = max(args.batch_size, 1)
        for i in range(0, len(crops), b):
            feats.append(np.asarray(
                feats_fn(params, jnp.asarray(crops[i:i + b])), np.float32))
        feats = np.concatenate(feats)
        return float(knn_accuracy(
            jnp.asarray(feats[tr]), jnp.asarray(labels[tr]),
            jnp.asarray(feats[te]), jnp.asarray(labels[te]),
            k=min(20, len(tr)),
        ))

    return probe


if __name__ == "__main__":
    main()
