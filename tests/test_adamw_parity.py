"""AdamW + cosine + EMA trajectory parity vs torch (round-3 VERDICT #5).

The SGD loss-curve test pins the forward/CE/backward chain; this one pins
the optimizer family the run book actually trains with
(/root/reference/train_instruct.txt:16-31 recipes; train.py:583
create_optimizer_v2 + :616-622 ModelEmaV2): decoupled AdamW with the
no-decay-for-1D mask, global-norm gradient clipping, the warmup-cosine
schedule, and the post-step parameter EMA. Same init, same batch stream —
torch and tpuwsi must produce matching step-by-step losses AND matching
EMA parameter trees at the end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tests.test_convert import TimmNamedViT  # noqa: E402
from tpuwsi.models.convert import torch_vit_to_flax  # noqa: E402
from tpuwsi.models.vit import ViTConfig, VisionTransformer  # noqa: E402
from tpuwsi.train import OptimConfig, create_train_state, make_optimizer  # noqa: E402
from tpuwsi.train.supervised import make_train_step  # noqa: E402

EMA_DECAY = 0.99
STEPS = 15


def test_adamw_cosine_ema_trajectory_matches_torch():
    torch.manual_seed(0)
    tm = TimmNamedViT(img=32, patch=16, dim=64, depth=2, heads=2, classes=2)

    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=2, dtype=jnp.float32, use_pallas_attention=False,
    )
    fm = VisionTransformer(cfg)
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = torch_vit_to_flax(tm.state_dict(), params)

    ocfg = OptimConfig(
        opt="adamw", lr=1e-3, weight_decay=0.05, betas=(0.9, 0.999),
        eps=1e-8, clip_grad=1.0, clip_mode="norm",
        sched="cosine", warmup_epochs=1, warmup_lr=1e-6, min_lr=1e-5,
        epochs=3, steps_per_epoch=5,
    )
    tx, schedule = make_optimizer(ocfg, params, global_batch_size=8)

    rs = np.random.RandomState(1)
    batches = [
        (rs.rand(8, 32, 32, 3).astype(np.float32), rs.randint(0, 2, size=8))
        for _ in range(STEPS)
    ]

    # --- torch side: AdamW with timm's ndim>1 decay mask, clip, per-step
    # cosine LR (driven by the SAME optax schedule values), ModelEmaV2-style
    # post-step EMA ---
    decay_p = [p for p in tm.parameters() if p.ndim > 1]
    plain_p = [p for p in tm.parameters() if p.ndim <= 1]
    opt = torch.optim.AdamW(
        [{"params": decay_p, "weight_decay": 0.05},
         {"params": plain_p, "weight_decay": 0.0}],
        lr=1.0, betas=(0.9, 0.999), eps=1e-8,
    )
    ema_t = {k: v.detach().clone() for k, v in tm.state_dict().items()}
    torch_losses = []
    for i, (x, y) in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = float(schedule(i))
        opt.zero_grad()
        logits = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        loss = tnn.functional.cross_entropy(logits, torch.from_numpy(y))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt.step()
        with torch.no_grad():
            for k, v in tm.state_dict().items():
                if v.is_floating_point():
                    ema_t[k].mul_(EMA_DECAY).add_(v, alpha=1 - EMA_DECAY)
        torch_losses.append(float(loss.detach()))

    # --- tpuwsi side: the production step with in-step EMA ---
    state = create_train_state(params, tx, ema=True)
    step = jax.jit(make_train_step(fm.apply, tx, augment_fn=None,
                                   compute_auc=False, ema_decay=EMA_DECAY))
    jax_losses = []
    rng = jax.random.PRNGKey(0)
    for x, y in batches:
        state, m = step(
            state, {"images": jnp.asarray(x), "labels": jnp.asarray(y)}, rng
        )
        jax_losses.append(float(m["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=2e-4, rtol=2e-4)
    assert abs(jax_losses[-1] - jax_losses[0]) > 1e-4  # training moved

    # EMA trees match leaf-for-leaf (convert torch's EMA through the same
    # name mapping used for checkpoint import)
    ema_flax = torch_vit_to_flax(ema_t, state.ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(ema_flax),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)
    # final (non-EMA) params match too — pins AdamW + clip + schedule
    # jointly (looser than the EMA: adam's sqrt(v)+eps division amplifies
    # f32 rounding over 15 steps; observed drift ~2e-4)
    params_flax = torch_vit_to_flax(tm.state_dict(), state.params)
    for a, b in zip(jax.tree_util.tree_leaves(params_flax),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=2e-2)
