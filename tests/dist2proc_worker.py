"""Worker process for the REAL 2-process jax.distributed integration test.

Launched by tests/test_dist2proc.py as ``python dist2proc_worker.py
<data_dir> <ckpt_dir> <result_json>`` with JAX_COORDINATOR_ADDRESS +
JAX_NUM_PROCESSES + JAX_PROCESS_ID in the environment — the exact env
contract ``tpuwsi.core.distributed.initialize_multihost`` supports for
generic N-process launches (torchrun's RANK/WORLD_SIZE equivalent;
reference: train.py:431 init_distributed_device under torchrun).

Each worker: real coordinator handshake → disjoint strided sampling with a
shared seed → a data-parallel train step over the 2-device GLOBAL mesh
(grad all-reduce crosses the process boundary via Gloo) → an orbax
checkpoint save that every process calls (orbax coordinates; replicated
arrays are written once, by process 0) → restore round-trip. Results go to
a JSON file the parent asserts on.
"""

import json
import os
import sys


def main() -> None:
    data_dir, ckpt_dir, result_path = sys.argv[1], sys.argv[2], sys.argv[3]

    import jax

    # Force CPU before ANY backend touch (the axon TPU plugin overrides the
    # JAX_PLATFORMS env var; the config call wins).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    from tpuwsi.core.distributed import initialize_multihost

    pidx, pcount = initialize_multihost()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpuwsi.core.mesh import MeshConfig, create_mesh
    from tpuwsi.io.folder import ImageFolderDataset
    from tpuwsi.models.vit import VisionTransformer, vit_tiny
    from tpuwsi.train import (
        CheckpointManager,
        OptimConfig,
        compile_step,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    # ---- disjoint strided sampling: same seed on every rank (as the CLI
    # loops do), stride by the REAL process index ----------------------------
    ds = ImageFolderDataset(data_dir)
    local_batches, seen = [], []
    for b in ds.batches(2, rng=np.random.default_rng(7), shuffle=True,
                        process_index=pidx, process_count=pcount):
        seen.extend(float(s) for s in b["images"].sum(axis=(1, 2, 3)))
        local_batches.append(b)

    # ---- identical init on every process (same seed), DP train step over
    # the global mesh: the gradient all-reduce crosses processes -------------
    cfg = dataclasses.replace(
        vit_tiny(num_classes=2, img_size=16, use_pallas_attention=False,
                 dtype=jnp.float32),
        depth=1,
    )
    model = VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tx, _ = make_optimizer(
        OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0), params,
        global_batch_size=4,
    )
    state = create_train_state(params, tx)
    step = make_train_step(model.apply, tx, augment_fn=None)

    mesh = create_mesh(MeshConfig(data=jax.device_count()))
    losses = []
    with mesh:
        jit_step = compile_step(step, mesh, state, donate=False)
        batch_sh = NamedSharding(mesh, P("data"))
        for b in local_batches:
            gbatch = {
                "images": jax.make_array_from_process_local_data(
                    batch_sh, np.asarray(b["images"], np.float32)
                ),
                "labels": jax.make_array_from_process_local_data(
                    batch_sh, np.asarray(b["labels"])
                ),
            }
            state, metrics = jit_step(state, gbatch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))

    param_sum = float(
        sum(float(jnp.sum(jnp.abs(p))) for p in jax.tree.leaves(state.params))
    )

    # ---- checkpoint: EVERY process calls save (orbax multihost contract,
    # same as the CLI loops); the bytes land once ----------------------------
    ckpt = CheckpointManager(ckpt_dir, rank_by_metric=False)
    ckpt.save(int(state.step), state, {"loss": losses[-1]})
    ckpt.wait()
    restored = ckpt.restore(target=state)
    restore_ok = all(
        bool(np.allclose(np.asarray(a), np.asarray(b)))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params))
    )
    ckpt.close()

    # ---- SyncBN across the PROCESS boundary (round-4 VERDICT #5): one BN
    # train step over the 2-process mesh; batch statistics must be computed
    # over the GLOBAL batch (GSPMD inserts the cross-process collective),
    # so (a) both processes hold identical stats and (b) they differ from
    # the stats of a local-shard-only step (each process's shard is
    # distribution-skewed by construction) -----------------------------------
    import flax.linen as nn

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True, rngs=None):
            x = nn.Conv(4, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9)(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(2)(x)

    bn_model = TinyBN()
    rng0 = jax.random.PRNGKey(0)
    bn_vars = bn_model.init(rng0, jnp.zeros((1, 16, 16, 3), jnp.float32))
    bn_params = {"params": bn_vars["params"]}
    bn_tx, _ = make_optimizer(
        OptimConfig(opt="sgd", lr=0.1, weight_decay=0.0), bn_params,
        global_batch_size=4)
    bn_step = make_train_step(bn_model.apply, bn_tx, augment_fn=None,
                              compute_auc=False, use_batch_stats=True)
    # per-process skew: shift the local images by the process index
    local_imgs = (np.asarray(local_batches[0]["images"], np.float32)
                  + 0.5 * pidx)
    local_labels = np.asarray(local_batches[0]["labels"])
    with mesh:
        bn_state = create_train_state(bn_params, bn_tx,
                                      batch_stats=bn_vars["batch_stats"])
        bn_jit = compile_step(bn_step, mesh, bn_state, donate=False)
        gb = {
            "images": jax.make_array_from_process_local_data(
                batch_sh, local_imgs),
            "labels": jax.make_array_from_process_local_data(
                batch_sh, local_labels),
        }
        bn_out, _ = bn_jit(bn_state, gb, jax.random.PRNGKey(2))
        global_stats = [
            np.asarray(x).tolist()
            for x in jax.tree.leaves(bn_out.batch_stats)
        ]
    # local-only reference: same step on just this process's shard
    bn_state_l = create_train_state(bn_params, bn_tx,
                                    batch_stats=bn_vars["batch_stats"])
    bn_out_l, _ = jax.jit(bn_step)(
        bn_state_l,
        {"images": jnp.asarray(local_imgs),
         "labels": jnp.asarray(local_labels)},
        jax.random.PRNGKey(2))
    local_stats = [
        np.asarray(x).tolist() for x in jax.tree.leaves(bn_out_l.batch_stats)
    ]

    with open(result_path, "w") as f:
        json.dump({
            "pidx": pidx,
            "pcount": pcount,
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "seen": sorted(seen),
            "losses": losses,
            "param_sum": param_sum,
            "final_step": int(state.step),
            "restore_ok": restore_ok,
            "bn_global_stats": global_stats,
            "bn_local_stats": local_stats,
        }, f)


if __name__ == "__main__":
    main()
