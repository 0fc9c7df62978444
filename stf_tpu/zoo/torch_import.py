"""PyTorch checkpoint importer: reference `.pth.tar` state dicts -> flax
param trees.

Handles (reference `zoo/pretrained.py:19-50`, `models/utils.py:46-111`):
  * `module.` DataParallel prefixes (stripped)
  * legacy `h_s.*` keys (dropped)
  * layout conversion: conv OIHW -> HWIO, transposed conv IOHW -> spatially
    flipped HWIO (validated numerically in tests/test_layers.py), Linear
    (out,in) -> (in,out), LayerNorm weight -> scale
  * the dynamically-sized CDF buffers (`_quantized_cdf` etc.) are simply
    ignored — tables are rebuilt host-side by `Codec.update()`.

Mappings are explicit per model family; `import_state_dict` walks my param
template and fails loudly on any missing/mismatched tensor.
"""

import re
from typing import Dict, Tuple

import numpy as np


def strip_prefixes(state_dict: Dict) -> Dict:
    """Strip DataParallel's `module.` prefix, drop legacy `h_s.` keys, and
    rename legacy ParameterList bottleneck keys (`_biases.0` -> `_bias0`,
    same for matrices/factors) — the reference's `load_pretrained`
    semantics (`zoo/pretrained.py:19-50`)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("h_s."):
            continue
        for plural, singular in (
            ("._biases.", "._bias"),
            ("._matrices.", "._matrix"),
            ("._factors.", "._factor"),
        ):
            if plural in k:
                head, idx = k.rsplit(".", 1)
                k = head.replace(plural[:-1], singular) + idx
        out[k] = v
    return out


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def deconv_kernel(w) -> np.ndarray:
    """torch ConvTranspose IOHW -> flax HWIO with spatial flip (flax's
    ConvTranspose correlates an unflipped kernel over the dilated input)."""
    return np.ascontiguousarray(_np(w).transpose(2, 3, 0, 1)[::-1, ::-1])


def dense_kernel(w) -> np.ndarray:
    """torch Linear (out,in) -> flax (in,out)."""
    return _np(w).transpose(1, 0)


class _Translator:
    """Maps a flax param path (tuple of names) to (torch key, kind)."""

    def __init__(self, rules):
        self.rules = rules  # list of (regex, template, kind)

    def __call__(self, path: Tuple[str, ...]):
        joined = "/".join(path)
        for pattern, template, kind in self.rules:
            m = re.fullmatch(pattern, joined)
            if m:
                return m.expand(template), kind
        return None, None


_LEAF = {
    "conv": {"kernel": "weight", "bias": "bias"},
    "deconv": {"kernel": "weight", "bias": "bias"},
    "dense": {"kernel": "weight", "bias": "bias"},
    "ln": {"scale": "weight", "bias": "bias"},
    "direct": None,
}

# Win_noShift_Attention internals (shared by WACNN g_a/g_s):
#   res_a{r}/Conv_{c}/Conv_0 -> conv_a.{r}.conv.{0|2|4}
#   win_attn/attn/...        -> conv_b.0.attn....
#   res_b{r}/Conv_{c}/Conv_0 -> conv_b.{r+1}.conv.{0|2|4}
#   proj/Conv_0              -> conv_b.4
_CONV_IDX = {"0": "0", "1": "2", "2": "4"}


def _attn_rules(flax_prefix: str, torch_prefix: str):
    f, t = flax_prefix, torch_prefix
    rules = []
    for c_flax, c_torch in _CONV_IDX.items():
        rules += [
            (rf"{f}/res_a(\d)/Conv_{c_flax}/Conv_0",
             rf"{t}.conv_a.\1.conv.{c_torch}", "conv"),
            (rf"{f}/res_b(\d)/Conv_{c_flax}/Conv_0",
             rf"{t}.conv_b.\g<1>PLUS1.conv.{c_torch}", "conv"),
        ]
    rules += [
        (rf"{f}/win_attn/attn/qkv", rf"{t}.conv_b.0.attn.qkv", "dense"),
        (rf"{f}/win_attn/attn/proj", rf"{t}.conv_b.0.attn.proj", "dense"),
        (rf"{f}/win_attn/attn/relative_position_bias_table",
         rf"{t}.conv_b.0.attn.relative_position_bias_table", "direct"),
        (rf"{f}/proj/Conv_0", rf"{t}.conv_b.4", "conv"),
    ]
    return rules


def _hyper_synthesis_rules(name: str):
    """conv_0->seq0, up_k -> seq(2+4k).0 (subpel conv), conv_k -> seq(4k)."""
    return [
        (rf"{name}/conv_0/Conv_0", rf"{name}.0", "conv"),
        (rf"{name}/up_0/Conv_0/Conv_0", rf"{name}.2.0", "conv"),
        (rf"{name}/conv_1/Conv_0", rf"{name}.4", "conv"),
        (rf"{name}/up_1/Conv_0/Conv_0", rf"{name}.6.0", "conv"),
        (rf"{name}/conv_2/Conv_0", rf"{name}.8", "conv"),
    ]


def _slice_transform_rules():
    return [
        (r"(cc_mean|cc_scale|lrp)_(\d+)/stack/conv_(\d)/Conv_0",
         r"\1_transforms.\2.SEQTIMES2", "conv"),
    ]


def _entropy_bottleneck_rules():
    return [
        (r"entropy_bottleneck/matrix_(\d)", r"entropy_bottleneck._matrix\1",
         "direct"),
        (r"entropy_bottleneck/bias_(\d)", r"entropy_bottleneck._bias\1",
         "direct"),
        (r"entropy_bottleneck/factor_(\d)", r"entropy_bottleneck._factor\1",
         "direct"),
        (r"entropy_bottleneck/quantiles", r"entropy_bottleneck.quantiles",
         "direct"),
    ]


def _wacnn_rules():
    ga_seq = {"conv_0": 0, "gdn_0": 1, "conv_1": 2, "gdn_1": 3, "attn_0": 4,
              "conv_2": 5, "gdn_2": 6, "conv_3": 7, "attn_1": 8}
    gs_seq = {"attn_0": 0, "deconv_0": 1, "igdn_0": 2, "deconv_1": 3,
              "igdn_1": 4, "attn_1": 5, "deconv_2": 6, "igdn_2": 7,
              "deconv_3": 8}
    rules = []
    for name, idx in ga_seq.items():
        if name.startswith("conv"):
            rules.append((rf"g_a/{name}/Conv_0", rf"g_a.{idx}", "conv"))
        elif name.startswith("gdn"):
            rules.append((rf"g_a/{name}/(beta|gamma)", rf"g_a.{idx}.\1",
                          "direct"))
        else:
            rules += _attn_rules(f"g_a/{name}", f"g_a.{idx}")
    for name, idx in gs_seq.items():
        if name.startswith("deconv"):
            rules.append((rf"g_s/{name}/ConvTranspose_0", rf"g_s.{idx}",
                          "deconv"))
        elif name.startswith("igdn"):
            rules.append((rf"g_s/{name}/(beta|gamma)", rf"g_s.{idx}.\1",
                          "direct"))
        else:
            rules += _attn_rules(f"g_s/{name}", f"g_s.{idx}")
    rules.append((r"h_a/conv_(\d)/Conv_0", r"h_a.SEQTIMES2", "conv"))
    rules += _hyper_synthesis_rules("h_mean_s")
    rules += _hyper_synthesis_rules("h_scale_s")
    rules += _slice_transform_rules()
    rules += _entropy_bottleneck_rules()
    return rules


def _stf_rules():
    rules = [
        (r"patch_embed/proj/Conv_0", r"patch_embed.proj", "conv"),
        (r"patch_embed/norm", r"patch_embed.norm", "ln"),
        (r"layer_(\d)/block_(\d)/norm([12])", r"layers.\1.blocks.\2.norm\3",
         "ln"),
        (r"layer_(\d)/block_(\d)/attn/(qkv|proj)",
         r"layers.\1.blocks.\2.attn.\3", "dense"),
        (r"layer_(\d)/block_(\d)/attn/relative_position_bias_table",
         r"layers.\1.blocks.\2.attn.relative_position_bias_table", "direct"),
        (r"layer_(\d)/block_(\d)/mlp/(fc[12])", r"layers.\1.blocks.\2.mlp.\3",
         "dense"),
        (r"layer_(\d)/downsample/norm", r"layers.\1.downsample.norm", "ln"),
        (r"layer_(\d)/downsample/reduction", r"layers.\1.downsample.reduction",
         "dense"),
        (r"syn_layer_(\d)/block_(\d)/norm([12])",
         r"syn_layers.\1.blocks.\2.norm\3", "ln"),
        (r"syn_layer_(\d)/block_(\d)/attn/(qkv|proj)",
         r"syn_layers.\1.blocks.\2.attn.\3", "dense"),
        (r"syn_layer_(\d)/block_(\d)/attn/relative_position_bias_table",
         r"syn_layers.\1.blocks.\2.attn.relative_position_bias_table",
         "direct"),
        (r"syn_layer_(\d)/block_(\d)/mlp/(fc[12])",
         r"syn_layers.\1.blocks.\2.mlp.\3", "dense"),
        (r"syn_layer_(\d)/upsample/norm", r"syn_layers.\1.downsample.norm",
         "ln"),
        (r"syn_layer_(\d)/upsample/reduction",
         r"syn_layers.\1.downsample.reduction", "dense"),
        (r"end_conv_0/Conv_0", r"end_conv.0", "conv"),
        (r"end_conv_1/Conv_0", r"end_conv.2", "conv"),
        (r"h_a/conv_(\d)/Conv_0", r"h_a.SEQTIMES2", "conv"),
    ]
    rules += _hyper_synthesis_rules("h_mean_s")
    rules += _hyper_synthesis_rules("h_scale_s")
    rules += _slice_transform_rules()
    rules += _entropy_bottleneck_rules()
    return rules


def _dystf_rules():
    """DYSTF (`compressai/models/dystf.py`): STF plus PredictorLG scorers
    and Ada blocks' fastMlp tails in the analysis stages."""
    rules = _stf_rules()
    rules += [
        # PredictorLG: in_conv = (LN, Linear, GELU); out_conv = (Linear,
        # GELU, Linear, GELU, Linear, LogSoftmax)
        (r"layer_(\d)/predictor_(\d)/in_norm",
         r"layers.\1.score_predictor.\2.in_conv.0", "ln"),
        (r"layer_(\d)/predictor_(\d)/in_fc",
         r"layers.\1.score_predictor.\2.in_conv.1", "dense"),
        (r"layer_(\d)/predictor_(\d)/out_fc1",
         r"layers.\1.score_predictor.\2.out_conv.0", "dense"),
        (r"layer_(\d)/predictor_(\d)/out_fc2",
         r"layers.\1.score_predictor.\2.out_conv.2", "dense"),
        (r"layer_(\d)/predictor_(\d)/out_fc3",
         r"layers.\1.score_predictor.\2.out_conv.4", "dense"),
        # fastMlp: fc1 = (LayerNorm, Linear)
        (r"layer_(\d)/block_(\d)/fastmlp/norm",
         r"layers.\1.blocks.\2.fastmlp.fc1.0", "ln"),
        (r"layer_(\d)/block_(\d)/fastmlp/fc1",
         r"layers.\1.blocks.\2.fastmlp.fc1.1", "dense"),
    ]
    return rules


def _swin_stage_rules(flax_prefix: str, torch_prefix: str, resample: str):
    """Rules for one stack of Swin stages (`tbc.py:265-351` BasicLayers):
    flax `<prefix>/stage_i/{block_j, downsample|upsample}` to torch
    `<prefix>.i.{blocks.j, downsample}` (the reference names PatchSplit
    attrs `downsample` too)."""
    f, t = flax_prefix, torch_prefix
    return [
        (rf"{f}/stage_(\d)/{resample}/norm", rf"{t}.\1.downsample.norm", "ln"),
        (rf"{f}/stage_(\d)/{resample}/reduction",
         rf"{t}.\1.downsample.reduction", "dense"),
        (rf"{f}/stage_(\d)/block_(\d)/norm([12])",
         rf"{t}.\1.blocks.\2.norm\3", "ln"),
        (rf"{f}/stage_(\d)/block_(\d)/attn/(qkv|proj)",
         rf"{t}.\1.blocks.\2.attn.\3", "dense"),
        (rf"{f}/stage_(\d)/block_(\d)/attn/relative_position_bias_table",
         rf"{t}.\1.blocks.\2.attn.relative_position_bias_table", "direct"),
        (rf"{f}/stage_(\d)/block_(\d)/mlp/(fc[12])",
         rf"{t}.\1.blocks.\2.mlp.\3", "dense"),
    ]


def _tbc_rules():
    """TBC (`compressai/models/tbc.py:388-591`): merge-first analysis /
    split-last synthesis stacks, transformer hyper stacks, 5-conv slice
    transforms. The reference's unused patch_embed/end_conv have no flax
    counterparts and are ignored."""
    rules = []
    rules += _swin_stage_rules("ana", "layers", "downsample")
    rules += _swin_stage_rules("syn", "syn_layers", "upsample")
    rules += _swin_stage_rules("h_a", "h_a", "downsample")
    rules += _swin_stage_rules("h_mean_s", "h_mean_s", "upsample")
    rules += _swin_stage_rules("h_scale_s", "h_scale_s", "upsample")
    rules += _slice_transform_rules()
    rules += _entropy_bottleneck_rules()
    return rules


def _cc_rules():
    """CC (`compressai/models/CC.py:23-104`): conv/GDN g_a & g_s, ReLU
    hyper, 3-conv slice stacks."""
    rules = [
        # g_a: conv at seq 2i, GDN at 2i+1; g_s mirrored with deconv/IGDN
        (r"g_a/conv_(\d)/Conv_0", r"g_a.SEQTIMES2", "conv"),
        (r"g_a/gdn_(\d)/(beta|gamma)", r"g_a.SEQ2IPLUS1.\2", "direct"),
        (r"g_s/deconv_(\d)/ConvTranspose_0", r"g_s.SEQTIMES2", "deconv"),
        (r"g_s/igdn_(\d)/(beta|gamma)", r"g_s.SEQ2IPLUS1.\2", "direct"),
        (r"h_a/conv_(\d)/Conv_0", r"h_a.SEQTIMES2", "conv"),
        (r"(h_mean_s|h_scale_s)/deconv_0/ConvTranspose_0", r"\1.0", "deconv"),
        (r"(h_mean_s|h_scale_s)/deconv_1/ConvTranspose_0", r"\1.2", "deconv"),
        (r"(h_mean_s|h_scale_s)/conv_0/Conv_0", r"\1.4", "conv"),
    ]
    rules += _slice_transform_rules()
    rules += _entropy_bottleneck_rules()
    return rules


def _cc_gd_rules():
    """CC_GD (`compressai/models/CC_gd.py:27-135,357-556`): CC with
    GateDecorators woven into the hyper stacks (torch Sequential indices
    conv=3i, gate=3i+1) and the first two convs of each slice transform.
    This is the KEY_TABLE layout — these rules load *gated* reference
    state dicts directly (the ungated CC -> CC_GD bootstrap is
    `models/cc_gd.py:init_cc_gd_from_cc`). Gate/mask buffers are stored
    (1,C,1,1) in torch and (C,) here ("gate" kind reshapes); `score`
    buffers are tick-loop state and are not imported.
    """
    rules = [
        # g_a / g_s stay ungated — identical to CC
        (r"g_a/conv_(\d)/Conv_0", r"g_a.SEQTIMES2", "conv"),
        (r"g_a/gdn_(\d)/(beta|gamma)", r"g_a.SEQ2IPLUS1.\2", "direct"),
        (r"g_s/deconv_(\d)/ConvTranspose_0", r"g_s.SEQTIMES2", "deconv"),
        (r"g_s/igdn_(\d)/(beta|gamma)", r"g_s.SEQ2IPLUS1.\2", "direct"),
    ]
    for i in range(3):
        rules += [
            (rf"h_a/conv_{i}/Conv_0", rf"h_a.{3 * i}", "conv"),
            (rf"h_a/gate_{i}/(gate|mask)", rf"h_a.{3 * i + 1}.\1", "gate"),
        ]
    for name in ("h_mean_s", "h_scale_s"):
        for i, (nm, inner, kind) in enumerate((
            ("deconv_0", "ConvTranspose_0", "deconv"),
            ("deconv_1", "ConvTranspose_0", "deconv"),
            ("conv_2", "Conv_0", "conv"),
        )):
            rules += [
                (rf"{name}/{nm}/{inner}", rf"{name}.{3 * i}", kind),
                (rf"{name}/gate_{i}/(gate|mask)",
                 rf"{name}.{3 * i + 1}.\1", "gate"),
            ]
    for j in range(3):
        rules.append(
            (rf"(cc_mean|cc_scale|lrp)_(\d+)/conv_{j}/Conv_0",
             rf"\1_transforms.\2.{3 * j}", "conv")
        )
    for j in range(2):  # gate_last=False: no gate after the final conv
        rules.append(
            (rf"(cc_mean|cc_scale|lrp)_(\d+)/gate_{j}/(gate|mask)",
             rf"\1_transforms.\2.{3 * j + 1}.\3", "gate")
        )
    rules += _entropy_bottleneck_rules()
    return rules


_RULES = {
    "cnn": _wacnn_rules,
    "stf": _stf_rules,
    "cc": _cc_rules,
    "cc_gd": _cc_gd_rules,
    "dystf": _dystf_rules,
    "tbc": _tbc_rules,
}


def _fix_key(key: str, path_joined: str) -> str:
    """Post-process template placeholders: SEQTIMES2 (conv_i -> seq 2*i),
    SEQ2IPLUS1 (gdn_i -> seq 2*i+1), PLUS1 (residual unit index shift)."""
    if "SEQTIMES2" in key:
        m = re.search(r"conv_(\d)", path_joined)
        key = key.replace("SEQTIMES2", str(2 * int(m.group(1))))
    if "SEQ2IPLUS1" in key:
        m = re.search(r"i?gdn_(\d)", path_joined)
        key = key.replace("SEQ2IPLUS1", str(2 * int(m.group(1)) + 1))
    m = re.search(r"(\d)PLUS1", key)
    if m:
        key = key.replace(m.group(0), str(int(m.group(1)) + 1))
    return key


def import_state_dict(model_name: str, template_params, state_dict):
    """Build a flax param tree shaped like `template_params` from a torch
    state dict. Raises KeyError/ValueError on unmapped or mismatched
    tensors."""
    import jax

    state_dict = strip_prefixes(state_dict)
    translate = _Translator(_RULES[model_name]())

    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            flat[path] = tree

    walk(
        jax.tree_util.tree_map(np.asarray, template_params), ()
    )

    out = {}
    for path, template_leaf in flat.items():
        leaf_name = path[-1]
        # 1) full-path "direct" rules (gdn beta/gamma, bias tables, EB params)
        torch_key, kind = translate(path)
        if torch_key is not None:
            torch_key = _fix_key(torch_key, "/".join(path))
            if torch_key not in state_dict:
                raise KeyError(f"missing torch key {torch_key!r}")
            tensor = _np(state_dict[torch_key])
            if kind == "gate":  # torch (1,C,1,1) -> flax (C,)
                tensor = tensor.reshape(-1)
        else:
            # 2) module rules + kernel/bias/scale leaf translation
            module_path = path[:-1]
            torch_base, kind = translate(module_path)
            if torch_base is None:
                raise KeyError(
                    f"no torch mapping for param path {'/'.join(path)!r}"
                )
            torch_base = _fix_key(torch_base, "/".join(module_path))
            torch_key = f"{torch_base}.{_LEAF[kind][leaf_name]}"
            if torch_key not in state_dict:
                raise KeyError(f"missing torch key {torch_key!r}")
            tensor = state_dict[torch_key]
            if leaf_name == "kernel" and kind == "conv":
                tensor = conv_kernel(tensor)
            elif leaf_name == "kernel" and kind == "deconv":
                tensor = deconv_kernel(tensor)
            elif leaf_name == "kernel" and kind == "dense":
                tensor = dense_kernel(tensor)
            else:
                tensor = _np(tensor)
        if tuple(tensor.shape) != tuple(template_leaf.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: torch {torch_key} has "
                f"{tensor.shape}, expected {template_leaf.shape}"
            )
        out[path] = tensor.astype(template_leaf.dtype)

    # rebuild the nested dict
    nested: Dict = {}
    for path, v in out.items():
        d = nested
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return nested


def load_torch_checkpoint(model_name: str, checkpoint_path: str, **model_kwargs):
    """Load a reference .pth.tar checkpoint into a fresh model. Returns
    (model, params)."""
    import jax
    import jax.numpy as jnp
    import torch

    from .registry import models

    blob = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    state_dict = blob.get("state_dict", blob)

    model = models[model_name](**model_kwargs)
    variables = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 256, 256, 3), jnp.float32),
        training=False,
    )
    params = import_state_dict(model_name, variables["params"], state_dict)
    return model, params
