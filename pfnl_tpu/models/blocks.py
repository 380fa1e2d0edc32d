"""Shared model building blocks."""

import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.ops.nonlocal_attn import nonlocal_attention, nonlocal_attention_chunked

xavier_uniform = nn.initializers.glorot_uniform
he_normal = nn.initializers.he_normal

# Dense N^2 attention above this many positions would blow HBM/VMEM; switch
# to the streaming kernel (flash recurrence / Pallas).
_DENSE_POSITION_LIMIT = 4096


def leaky_relu(x, alpha: float = 0.2):
    """tf.nn.leaky_relu default alpha=0.2 (PFNL/FRVSR-flow activation)."""
    return jnp.maximum(x, alpha * x)


class ConvParams(nn.Module):
    """Owns a conv kernel+bias under the module's name (same param tree as
    an nn.Conv submodule) without fixing how the conv is executed — used
    by the layout-selectable conv paths (PFNL's packed conv0 head, the
    DRVSR/FRVSR packed decoder tails)."""

    kshape: tuple
    kernel_init: object

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.kshape)
        b = self.param("bias", nn.initializers.zeros, (self.kshape[-1],))
        return k, b


class PReLU(nn.Module):
    """Per-channel PReLU with zero-initialized slope
    (reference modules/videosr_ops.py:44-51).

    `channels` pins the alpha parameter to the LOGICAL channel count so
    the activation can also be applied on a space-to-depth-packed layout
    (packed channel = phase*C + c, so alpha tiles phase-major); leaving
    it None infers from the input as before."""

    channels: int = None

    @nn.compact
    def __call__(self, x):
        c = self.channels if self.channels is not None else x.shape[-1]
        alpha = self.param("alpha", nn.initializers.zeros, (c,))
        a = alpha
        if x.shape[-1] != c:
            assert x.shape[-1] % c == 0, (x.shape, c)
            a = jnp.tile(alpha, x.shape[-1] // c)
        return jax.nn.relu(x) + a.astype(x.dtype) * (x - jnp.abs(x)) * 0.5


class NonLocalBlock(nn.Module):
    """Non-local self-attention block (reference utils.py:18-71).

    nltype: 0 embedded-gaussian (1x1 convs on theta/phi), 1 gaussian
    (theta=phi=input), 2 dot-product (relu/rowsum normalization).
    sub_sample > 1 average-pools g and phi only (quirk preserved).
    Returns w_y WITHOUT the residual — the caller adds it, as in the
    reference (model/pfnl.py:60).

    impl: "auto" picks dense for small N, streaming for large; "dense" /
    "chunked" force a path.  stabilize=False reproduces the reference's
    unstabilized exp (utils.py:57) for parity testing.
    """

    out_channels: int
    sub_sample: int = 1
    nltype: int = 1
    stabilize: bool = True
    impl: str = "auto"
    chunk_block: int = 1024
    dtype: jnp.dtype = None  # None = promote (f32); pass bf16 for throughput

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        assert self.nltype in (0, 1, 2), f"unsupported nltype {self.nltype}"
        conv = lambda feats, name: nn.Conv(
            feats, (1, 1), padding="SAME", kernel_init=xavier_uniform(),
            dtype=self.dtype, name=name,
        )

        g = conv(self.out_channels, "g")(x)
        if self.nltype in (0, 2):
            phi = conv(self.out_channels, "phi")(x)
            theta = conv(self.out_channels, "theta")(x)
        else:
            phi = x
            theta = x
        if self.sub_sample > 1:
            s = self.sub_sample
            g = nn.avg_pool(g, (s, s), strides=(s, s))
            phi = nn.avg_pool(phi, (s, s), strides=(s, s))

        gf = g.reshape(n, -1, g.shape[-1])
        phif = phi.reshape(n, -1, phi.shape[-1])
        thetaf = theta.reshape(n, h * w, theta.shape[-1])

        if self.nltype == 2:
            y = nonlocal_attention(thetaf, phif, gf, mode="relu_mean")
        else:
            impl = self.impl
            if impl == "auto":
                if thetaf.shape[1] <= _DENSE_POSITION_LIMIT:
                    impl = "dense"
                else:
                    # fused flash kernel on TPU; streaming-scan fallback elsewhere
                    impl = "pallas" if jax.default_backend() == "tpu" else "chunked"
            if impl == "dense":
                y = nonlocal_attention(thetaf, phif, gf, mode="softmax", stabilize=self.stabilize)
            elif impl == "chunked":
                y = nonlocal_attention_chunked(thetaf, phif, gf, block=self.chunk_block)
            elif impl == "pallas":
                from pfnl_tpu.ops.pallas.nonlocal_flash import nonlocal_flash

                y = nonlocal_flash(thetaf, phif, gf)
            else:
                raise ValueError(f"unknown nonlocal impl: {impl}")

        y = y.reshape(n, h, w, self.out_channels)
        return conv(c, "w")(y)
