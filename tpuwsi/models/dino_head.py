"""DINO projection head.

Parity target: the orphaned ``DINOHead`` recovered from
nn_encoder_arch/__pycache__/vision_transformer.cpython-37.pyc (SURVEY §2.9):
MLP with bottleneck, optional hidden BatchNorm, GELU, L2-normalisation of the
bottleneck, and a weight-normalised final linear layer (no bias). The new
framework makes the reference's latent DINO capability real (SURVEY §0).

TPU notes: the whole head is a short chain of GEMMs — it fuses into the ViT
step under jit. Weight norm is expressed as an explicit direction/magnitude
parameterisation (``v / ||v|| * g``) so the teacher's ``norm_last_layer``
freeze is just stop-gradient on ``g``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuwsi.models.vit import trunc_normal_init


class WeightNormDense(nn.Module):
    """Bias-free linear layer with weight normalisation on each output col."""

    features: int
    fixed_gain: bool = False  # DINO norm_last_layer=True → g frozen at 1
    dtype: jnp.dtype = jnp.float32  # GEMM I/O dtype; norm math stays fp32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("v", trunc_normal_init(), (in_dim, self.features), jnp.float32)
        g = self.param("g", nn.initializers.ones, (self.features,), jnp.float32)
        if self.fixed_gain:
            g = jax.lax.stop_gradient(g)
        w = v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12) * g
        # bf16 prototype GEMM with fp32 accumulation on the MXU: the weight
        # normalisation itself stays fp32 (tiny), only the (B, in) x (in, K)
        # product runs at bf16 rate.
        return jax.lax.dot(
            x.astype(self.dtype), w.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )


class DINOHead(nn.Module):
    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    use_bn: bool = False
    norm_last_layer: bool = True
    gelu_approx: bool = False
    # bf16 GEMMs (fp32 params/accum) — the L2-normalise before the prototype
    # layer stays fp32. fp32 default preserves checkpoint-parity numerics.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        n = max(self.nlayers, 1)
        dense_kw = dict(
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(),
        )
        if n == 1:
            # named like the >1 branch's output layer so the param tree
            # stays uniform across nlayers settings
            x = nn.Dense(self.bottleneck_dim, name="mlp_out", **dense_kw)(x)
        else:
            for i in range(n - 1):
                x = nn.Dense(self.hidden_dim, name=f"mlp_{i}", **dense_kw)(x)
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=deterministic, name=f"bn_{i}",
                        dtype=jnp.float32,
                    )(x)
                x = nn.gelu(x, approximate=self.gelu_approx)
            x = nn.Dense(self.bottleneck_dim, name="mlp_out", **dense_kw)(x)
        x = x.astype(jnp.float32)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        x = WeightNormDense(
            self.out_dim, fixed_gain=self.norm_last_layer, dtype=self.dtype,
            name="last_layer",
        )(x)
        return x
