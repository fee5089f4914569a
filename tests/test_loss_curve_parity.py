"""Loss-curve reproduction (BASELINE.json: 'reproducing reference loss
curves'): training the SAME ViT from the SAME initial weights on the SAME
batch sequence with plain SGD must produce matching step-by-step loss curves
in torch and tpuwsi. This pins forward, cross-entropy, backward, and SGD
semantics jointly."""

import math

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


def test_sgd_loss_curves_match_torch():
    torch.manual_seed(0)
    tm = TimmNamedViT(img=32, patch=16, dim=64, depth=2, heads=2, classes=2)

    cfg = ViTConfig(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=2, dtype=jnp.float32, use_pallas_attention=False,
    )
    fm = VisionTransformer(cfg)
    params = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = torch_vit_to_flax(tm.state_dict(), params)

    lr = 0.05
    # identical batch stream
    rs = np.random.RandomState(0)
    batches = [
        (
            rs.rand(8, 32, 32, 3).astype(np.float32),
            rs.randint(0, 2, size=8),
        )
        for _ in range(10)
    ]

    # --- torch side: plain SGD, CE ---
    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=0.9)
    torch_losses = []
    for x, y in batches:
        opt.zero_grad()
        logits = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        loss = tnn.functional.cross_entropy(logits, torch.from_numpy(y))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # --- tpuwsi side: same recipe ---
    ocfg = OptimConfig(opt="momentum", lr=lr, momentum=0.9, weight_decay=0.0,
                       sched="constant", warmup_epochs=0, epochs=1,
                       steps_per_epoch=10)
    tx, _ = make_optimizer(ocfg, params, global_batch_size=8)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(fm.apply, tx, augment_fn=None,
                                   compute_auc=False))
    jax_losses = []
    rng = jax.random.PRNGKey(0)
    for x, y in batches:
        state, m = step(
            state, {"images": jnp.asarray(x), "labels": jnp.asarray(y)}, rng
        )
        jax_losses.append(float(m["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=5e-4, rtol=5e-4)
    # and training actually moves: final loss differs from first
    assert abs(jax_losses[-1] - jax_losses[0]) > 1e-4
