"""DYSTF — STF with dynamic (input-adaptive) token pruning.

Behavior parity with the reference (`compressai/models/dystf.py`):
  * `PredictorLG` importance scorer (`dystf.py:155-200`): LN+Linear+GELU,
    local/global feature mix, 3-layer MLP head to 2-way log-softmax.
    Training: straight-through Gumbel-softmax hard keep-mask. Eval: top-k
    token split with keep count N*ratio (static shapes — jit-friendly).
  * `AdaSwinTransformerBlock` (`dystf.py:299-399`): attention runs on the
    merged/full token set; the MLP tail routes kept tokens through the full
    MLP and dropped tokens through a cheap `fastMlp` (LN+Linear). Training
    uses the reference's dual-tensor [x1, x2] masked protocol; eval uses
    gather -> two MLPs -> scatter with a *fixed* k, which maps cleanly onto
    XLA (the reference's torch version does the same index split,
    `dystf.py:194-200`).
  * Pruning locations: global block indexes `pruning_locs=[4,8,12]` with
    keep ratios `sparse_ratio=[0.9,0.7,0.5]` mapped to per-stage local
    offsets (`dystf.py:736-745`).
  * forward returns `decisions` (the masks/index-splits of the last pruned
    stage) and the student latent `y` during training for distillation
    (`dystf.py:904-978`). Synthesis is the plain STF synthesis.
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy import EntropyBottleneck
from ..layers import Conv
from ..layers.conv import gelu, pixel_shuffle
from ..layers.swin import (
    BasicLayer,
    DropPath,
    Mlp,
    PatchEmbed,
    PatchMerging,
    SwinTransformerBlock,
)
from ..layers.win_attention import WindowAttention, shifted_window_region_labels
from .base import ChannelARModel, ConvGeluStack, SliceTransform
from .stf import STFHyperSynthesis


def gumbel_softmax_hard(rng, logits, axis=-1):
    """Straight-through Gumbel-softmax (hard one-hot forward, soft grad)."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax(logits + g, axis=axis)
    idx = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(y_soft)
    y_hard = jnp.put_along_axis(y_hard, idx, 1.0, axis=axis, inplace=False)
    # group (soft - sg(soft)) first: it is exactly zero in the forward pass,
    # so the output is the exact one-hot (no float cancellation error)
    return y_hard + (y_soft - jax.lax.stop_gradient(y_soft))


class FastMlp(nn.Module):
    """Cheap MLP for dropped tokens: LN + Linear (`dystf.py:42-56`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.dim, name="fc1")(x)


class PredictorLG(nn.Module):
    """Token importance scorer (`dystf.py:155-200`); returns (B,N,2) log
    probabilities [keep, drop]."""

    dim: int

    @nn.compact
    def __call__(self, tokens):
        x = nn.LayerNorm(epsilon=1e-5, name="in_norm")(tokens)
        x = nn.Dense(self.dim, name="in_fc")(x)
        x = gelu(x)
        C = self.dim
        local_x = x[..., : C // 2]
        global_x = jnp.mean(x[..., C // 2 :], axis=1, keepdims=True)
        x = jnp.concatenate(
            [local_x, jnp.broadcast_to(global_x, local_x.shape)], axis=-1
        )
        x = nn.Dense(C // 2, name="out_fc1")(x)
        x = gelu(x)
        x = nn.Dense(C // 4, name="out_fc2")(x)
        x = gelu(x)
        x = nn.Dense(2, name="out_fc3")(x)
        return jax.nn.log_softmax(x, axis=-1)


class AdaSwinTransformerBlock(nn.Module):
    """Swin block with token-routing MLP tail (`dystf.py:299-399`)."""

    dim: int
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    def _attention(self, tokens, H, W, deterministic):
        B = tokens.shape[0]
        C = self.dim
        ws, ss = self.window_size, self.shift_size
        x = tokens.reshape(B, H, W, C)

        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if ss > 0:
            labels = shifted_window_region_labels(Hp, Wp, ws, ss)
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        else:
            labels = None
        x = WindowAttention(
            dim=C, window_size=(ws, ws), num_heads=self.num_heads, name="attn"
        )(x, labels=labels)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]
        x = x.reshape(B, H * W, C)
        return tokens + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic
        )

    @nn.compact
    def __call__(self, state, H, W, route, training: bool,
                 deterministic: bool = True):
        """`route` is a (B,N,1) soft mask in training, or an (idx_keep,
        idx_drop) pair at eval; `state` is [x1,x2] in training else tokens."""
        mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")
        fast = FastMlp(self.dim, name="fastmlp")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        dp = DropPath(self.drop_path, name="drop_path2")

        if training:
            x1, x2 = state
            mask = route
            x = x1 * mask + x2 * (1 - mask)
            x = self._attention(x, H, W, deterministic)
            x1 = x * mask + x1 * (1 - mask)
            x2 = x * (1 - mask) + x2 * mask
            x1 = x + dp(mlp(norm2(x1)), deterministic)
            x2 = x + dp(fast(x2), deterministic)
            return [x1, x2]
        else:
            idx_keep, idx_drop = route
            x = self._attention(state, H, W, deterministic)
            B = x.shape[0]
            b_idx = jnp.arange(B)[:, None]
            x1 = dp(mlp(norm2(x[b_idx, idx_keep])), deterministic)
            x2 = dp(fast(x[b_idx, idx_drop]), deterministic)
            filled = jnp.zeros_like(x)
            filled = filled.at[b_idx, idx_keep].set(x1)
            filled = filled.at[b_idx, idx_drop].set(x2)
            return x + filled


class DyBasicLayer(nn.Module):
    """STF analysis stage with optional predictors at `pruning_locs`
    (`dystf.py:488-633`). Returns (x_map, decisions)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 4
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] = ()
    merge: bool = False
    pruning_locs: Tuple[int, ...] = ()
    sparse_ratio: Tuple[float, ...] = ()
    n_predictors: int = 0

    @nn.compact
    def __call__(self, x, training: bool = False, deterministic: bool = True):
        B, H, W, C = x.shape
        decisions = []

        if not self.pruning_locs or self.n_predictors == 0:
            for i in range(self.depth):
                dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
                x = SwinTransformerBlock(
                    dim=self.dim,
                    num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dp,
                    name=f"block_{i}",
                )(x, deterministic)
            if self.merge:
                x = PatchMerging(self.dim, name="downsample")(x)
            return x, decisions

        predictors = [
            PredictorLG(self.dim, name=f"predictor_{p}")
            for p in range(self.n_predictors)
        ]
        tokens = x.reshape(B, H * W, C)
        state = tokens  # tokens before first prune; [x1,x2] after (training)
        route = None
        p_idx = 0
        first_loc = self.pruning_locs[0]
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            # membership check + sequential predictor counter: exactly the
            # reference's runtime rule (`dystf.py:612-618`), including its
            # shared-list quirks (see DYSTF.setup)
            if p_idx < self.n_predictors and i in self.pruning_locs:
                if training:
                    merged = (
                        state
                        if route is None
                        else state[0] * route + state[1] * (1 - route)
                    )
                    scores = predictors[p_idx](merged)
                    route = gumbel_softmax_hard(
                        self.make_rng("gumbel"), scores
                    )[..., 0:1]
                    if p_idx == 0:
                        state = [merged, merged]
                else:
                    scores = predictors[p_idx](state)[..., 0]
                    n_keep = int(scores.shape[1] * self.sparse_ratio[p_idx])
                    order = jnp.argsort(-scores, axis=1)
                    route = (order[:, :n_keep], order[:, n_keep:])
                decisions.append(route)
                p_idx += 1

            if i < first_loc:
                x_map = state.reshape(B, H, W, C)
                x_map = SwinTransformerBlock(
                    dim=self.dim,
                    num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dp,
                    name=f"block_{i}",
                )(x_map, deterministic)
                state = x_map.reshape(B, H * W, C)
            else:
                state = AdaSwinTransformerBlock(
                    dim=self.dim,
                    num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=0 if i % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dp,
                    name=f"block_{i}",
                )(state, H, W, route, training, deterministic)

        if training and isinstance(state, list):
            tokens = state[0] * route + state[1] * (1 - route)
        else:
            tokens = state
        x = tokens.reshape(B, H, W, C)
        if self.merge:
            x = PatchMerging(self.dim, name="downsample")(x)
        return x, decisions


class DYSTF(ChannelARModel):
    """Dynamic-inference STF ("dystf" in the registry)."""

    patch_size: int = 2
    embed_dim: int = 48
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 4
    num_slices: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    sparse_ratio: Tuple[float, ...] = (0.9, 0.7, 0.5)
    pruning_locs: Tuple[int, ...] = (4, 8, 12)

    @property
    def max_support_slices(self) -> int:
        return self.num_slices // 2

    def setup(self):
        n_stages = len(self.depths)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        # Map global pruning block indexes to local offsets. The reference
        # (`dystf.py:736-762`) passes the SAME mutable lists to every stage
        # while appending to them, so at runtime every pruned stage sees the
        # final accumulated (offset, ratio) lists — e.g. with the defaults,
        # stage 2 prunes twice (offsets 1@0.9 and 3@0.7) and stage 3 prunes
        # at 0.9, and the 0.5 entry is never reached. Each stage's predictor
        # count is frozen at its construction time. We replicate those
        # runtime semantics exactly (they are what the published recipe
        # trains), via `n_predictors` + the shared entry lists.
        entries = []  # (local offset, ratio), construction order
        n_preds_at_stage = {}
        block_cnt = 0
        p = 0
        for i in range(n_stages):
            former = block_cnt
            block_cnt += self.depths[i]
            while p < len(self.pruning_locs) and block_cnt >= self.pruning_locs[p]:
                entries.append(
                    (self.pruning_locs[p] - former - 1, self.sparse_ratio[p])
                )
                p += 1
            n_preds_at_stage[i] = len(entries)
        shared_locs = tuple(e[0] for e in entries)
        shared_ratios = tuple(e[1] for e in entries)

        layers = []
        for i in range(n_stages):
            start = sum(self.depths[:i])
            layers.append(
                DyBasicLayer(
                    dim=self.embed_dim * 2 ** i,
                    depth=self.depths[i],
                    num_heads=self.num_heads[i],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=tuple(dpr[start : start + self.depths[i]]),
                    merge=i < n_stages - 1,
                    pruning_locs=shared_locs,
                    sparse_ratio=shared_ratios,
                    n_predictors=n_preds_at_stage[i],
                    name=f"layer_{i}",
                )
            )
        self.layers = layers

        rdepths = self.depths[::-1]
        rheads = self.num_heads[::-1]
        syn_layers = []
        for i in range(n_stages):
            start = sum(rdepths[:i])
            syn_layers.append(
                BasicLayer(
                    dim=self.embed_dim * 2 ** (n_stages - 1 - i),
                    depth=rdepths[i],
                    num_heads=rheads[i],
                    window_size=self.window_size,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=tuple(dpr[start : start + rdepths[i]]),
                    resample="split" if i < n_stages - 1 else None,
                    name=f"syn_layer_{i}",
                )
            )
        self.syn_layers = syn_layers

        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim
        )
        self.end_conv_0 = Conv(
            self.embed_dim * self.patch_size ** 2, kernel_size=5, stride=1,
            name="end_conv_0",
        )
        self.end_conv_1 = Conv(3, kernel_size=3, stride=1, name="end_conv_1")

        M = self.embed_dim * 2 ** (len(self.depths) - 1)
        N = M // 2
        self.h_a = ConvGeluStack(
            features=(M, 336, 288, 240, N),
            kernel_sizes=(3, 3, 3, 3, 3),
            strides=(1, 1, 2, 1, 2),
            name="h_a",
        )
        self.h_mean_s = STFHyperSynthesis(name="h_mean_s")
        self.h_scale_s = STFHyperSynthesis(name="h_scale_s")

        slice_ch = M // self.num_slices
        self.cc_mean_transforms = [
            SliceTransform(slice_ch, name=f"cc_mean_{i}")
            for i in range(self.num_slices)
        ]
        self.cc_scale_transforms = [
            SliceTransform(slice_ch, name=f"cc_scale_{i}")
            for i in range(self.num_slices)
        ]
        self.lrp_transforms = [
            SliceTransform(slice_ch, name=f"lrp_{i}")
            for i in range(self.num_slices)
        ]
        self.entropy_bottleneck = EntropyBottleneck(N)

    def _analysis_with_decisions(self, x, training: bool):
        det = not self.has_rng("droppath")
        x = self.patch_embed(x)
        final_decisions = []
        for layer in self.layers:
            x, decisions = layer(x, training=training, deterministic=det)
            if decisions:
                final_decisions = decisions
        return x, final_decisions

    def analysis(self, x):
        y, _ = self._analysis_with_decisions(x, training=False)
        return y

    def synthesis(self, y_hat):
        det = not self.has_rng("droppath")
        x = y_hat
        for layer in self.syn_layers:
            x = layer(x, deterministic=det)
        x = self.end_conv_0(x)
        x = pixel_shuffle(x, self.patch_size)
        return self.end_conv_1(x)

    def __call__(self, x, training: bool = True):
        y, decisions = self._analysis_with_decisions(x, training)
        y_hat, likelihoods = self.entropy_forward(y, training)
        x_hat = self.synthesis(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": likelihoods,
            "decisions": decisions,
            "y": y if training else None,
        }
