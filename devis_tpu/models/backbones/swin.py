"""Swin Transformer backbone (flax, NHWC) — capability equivalent of the
reference's vendored SeqFormer Swin (`src/models/swin_backbone.py:66-746`):
4×4 patch embed, shifted-window attention with relative position bias,
patch-merging downsample, per-stage LayerNorm outputs at strides
[4, 8, 16, 32]. Variants swin_{t,s,b,l}_p4w7 and swin_l_p4w12
(`src/models/swin_backbone.py:671-746`).

TPU notes: windows are partitioned with static shapes (inputs are padded to
window multiples with zeros — matching the reference's F.pad); attention is
batched over (num_windows × B) so the MXU sees one large batched matmul per
block. Shifted windows use jnp.roll + a precomputed additive mask.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nH·nW, w, w, C); H, W divisible by w."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)


def window_reverse(wins: jnp.ndarray, w: int, B: int, H: int, W: int):
    C = wins.shape[-1]
    x = wins.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def relative_position_index(w: int) -> np.ndarray:
    """(w², w²) index into the (2w-1)² bias table (reference L96-106)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))           # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # (2, w², w²)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference L66-144)."""
    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None):
        """x: (nW, N, C) with N = window²; mask: (n_mask, N, N) or None."""
        nW, N, C = x.shape
        h = self.num_heads
        hd = C // h
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window - 1) ** 2, h))
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(nW, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                    # (nW, h, N, hd)
        attn = jnp.einsum("whnd,whmd->whnm", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nm = mask.shape[0]
            attn = attn.reshape(nW // nm, nm, h, N, N) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(nW, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(nW, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


def shift_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Additive −100 mask between originally-disjoint regions
    (reference L201-219). Returns (nW, w², w²)."""
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3) \
        .reshape(-1, w * w)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0        # stochastic-depth prob (reference L114-128)
    deterministic: bool = True
    dtype: Any = jnp.float32

    def _drop_path(self, x: jnp.ndarray) -> jnp.ndarray:
        """Per-sample stochastic depth (timm DropPath, used by the reference
        block on both residual branches, swin_backbone.py:114-128,240-244):
        drop the whole branch with prob `drop_path`, rescale by 1/keep."""
        if self.deterministic or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep,
                                    (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, H, W, C), H/W already padded to window multiples."""
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(H, W, w, self.shift))
        else:
            mask = None
        wins = window_partition(x, w).reshape(-1, w * w, C)
        wins = WindowAttention(C, self.num_heads, w, dtype=self.dtype,
                               name="attn")(wins, mask)
        x = window_reverse(wins.reshape(-1, w, w, C), w, B, H, W)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + self._drop_path(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + self._drop_path(y)


class PatchMerging(nn.Module):
    """2× downsample: concat 2×2 neighborhood → LN → linear 4C→2C
    (reference L247-285)."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            H, W = H + pad_h, W + pad_w
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns the 4 stage outputs (strides 4/8/16/32), each LayerNorm'd."""
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    num_channels: Sequence[int] = (96, 192, 384, 768)   # set by SWIN_CONFIGS
    drop_path_rate: float = 0.2   # linear 0→rate over all blocks (ref L507)
    use_checkpoint: bool = False  # remat each block (ref L378 torch.utils.checkpoint)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> List[jnp.ndarray]:
        d = self.dtype
        x = x.astype(d)
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=d,
                    name="patch_embed_proj")(x)
        x = nn.LayerNorm(dtype=d, name="patch_embed_norm")(x)

        # stochastic-depth decay rule: linspace over the block total (ref L507)
        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        block_cls = nn.remat(SwinBlock) if self.use_checkpoint else SwinBlock

        outs = []
        w = self.window
        blk_id = 0
        for stage, (depth, heads) in enumerate(zip(self.depths,
                                                   self.num_heads)):
            B, H, W, C = x.shape
            # pad to window multiples once per stage (shapes are static)
            Hp, Wp = -(-H // w) * w, -(-W // w) * w
            xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else w // 2
                if min(Hp, Wp) <= w:
                    shift = 0
                xp = block_cls(C, heads, w, shift, self.mlp_ratio,
                               drop_path=float(dpr[blk_id]),
                               deterministic=deterministic, dtype=d,
                               name=f"layers_{stage}_blocks_{blk}")(xp)
                blk_id += 1
            x = xp[:, :H, :W]
            outs.append(nn.LayerNorm(dtype=d, name=f"norm{stage}")(x))
            if stage < len(self.depths) - 1:
                x = PatchMerging(C, dtype=d,
                                 name=f"layers_{stage}_downsample")(x)
        return outs


def _cfg(embed, depths, heads, window, drop_path_rate):
    return dict(embed_dim=embed, depths=depths, num_heads=heads, window=window,
                num_channels=tuple(embed * 2 ** i for i in range(4)),
                drop_path_rate=drop_path_rate)


# drop_path rates from the reference registry (swin_backbone.py:671-746)
SWIN_CONFIGS = {
    "swin_t_p4w7": _cfg(96, (2, 2, 6, 2), (3, 6, 12, 24), 7, 0.2),
    "swin_s_p4w7": _cfg(96, (2, 2, 18, 2), (3, 6, 12, 24), 7, 0.2),
    "swin_b_p4w7": _cfg(128, (2, 2, 18, 2), (4, 8, 16, 32), 7, 0.3),
    "swin_l_p4w7": _cfg(192, (2, 2, 18, 2), (6, 12, 24, 48), 7, 0.3),
    "swin_l_p4w12": _cfg(192, (2, 2, 18, 2), (6, 12, 24, 48), 12, 0.3),
}
