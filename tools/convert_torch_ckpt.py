"""Convert reference PyTorch checkpoints to tpuseg flax trees.

Usage:
  python tools/convert_torch_ckpt.py --arch ocrnet.HRNet_Mscale \
      --torch-ckpt cityscapes_ocrnet.HRNet_Mscale_outstanding-turtle.pth \
      --out ckpt_jax/

Handles (reference naming per network/hrnetv2.py, network/ocrnet.py,
network/ocr_utils.py, network/utils.py):
- HRNetV2-W48 trunk: stem, layer1 bottlenecks, transition1-3, stage2-4
  modules (branches + fuse layers);
- OCR block: conv3x3_ocr, aux head, ObjectAttention f_pixel/f_object/
  f_down/f_up, conv_bn_dropout, cls head;
- scale-attention head;
- the reference's own remaps: 'module.' DataParallel prefixes
  (wider_resnet.py:406-412), 'model.' prefixes and 'last_layer'->'aux_head'
  (hrnetv2.py:467-469).

Weight layout transforms:
- conv: OIHW -> HWIO;
- depthwise conv: torch (C,1,H,W) groups=C -> flax HWIO (H,W,1,C);
- BN: weight/bias -> scale/bias params, running_mean/var -> batch_stats.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------------------
# key translation: flax path -> torch key prefix
# ---------------------------------------------------------------------------

def _hrnet_torch_prefix(flax_path: str) -> str | None:
    """Map one flax HRNetV2 module path to the torch module prefix.

    flax naming: tpuseg/models/hrnet.py; torch naming: the HRNet upstream
    scheme used by the reference (network/hrnetv2.py).
    """
    m = re.match(r"stem_conv(\d)$", flax_path)
    if m:
        return f"conv{m.group(1)}"
    m = re.match(r"stem_bn(\d)$", flax_path)
    if m:
        return f"bn{m.group(1)}"
    m = re.match(r"layer1_block(\d+)/(.+)$", flax_path)
    if m:
        b, rest = m.groups()
        return f"layer1.{b}." + _block_sub(rest)
    m = re.match(r"transition(\d)/t(\d+)_conv(\d*)$", flax_path)
    if m:
        t, i, j = m.groups()
        if j == "":
            return f"transition{t}.{i}.0"
        return f"transition{t}.{i}.{j}.0"
    m = re.match(r"transition(\d)/t(\d+)_bn(\d*)$", flax_path)
    if m:
        t, i, j = m.groups()
        if j == "":
            return f"transition{t}.{i}.1"
        return f"transition{t}.{i}.{j}.1"
    m = re.match(r"stage(\d)_m(\d+)/branch(\d+)_block(\d+)/(.+)$", flax_path)
    if m:
        s, mod, br, b, rest = m.groups()
        return f"stage{s}.{mod}.branches.{br}.{b}." + _block_sub(rest)
    m = re.match(r"stage(\d)_m(\d+)/fuse(\d+)_(\d+)_conv(\d*)$", flax_path)
    if m:
        s, mod, i, j, k = m.groups()
        base = f"stage{s}.{mod}.fuse_layers.{i}.{j}"
        # j > i: Sequential(conv, bn); j < i: nested Sequentials
        return f"{base}.0" if k == "" else f"{base}.{k}.0"
    m = re.match(r"stage(\d)_m(\d+)/fuse(\d+)_(\d+)_bn(\d*)$", flax_path)
    if m:
        s, mod, i, j, k = m.groups()
        base = f"stage{s}.{mod}.fuse_layers.{i}.{j}"
        return f"{base}.1" if k == "" else f"{base}.{k}.1"
    return None


def _block_sub(rest: str) -> str:
    """conv1 -> conv1, bn2 -> bn2, downsample_conv -> downsample.0,
    downsample_bn -> downsample.1."""
    if rest == "downsample_conv":
        return "downsample.0"
    if rest == "downsample_bn":
        return "downsample.1"
    return rest


def _ocr_torch_prefix(flax_path: str) -> str | None:
    """OCR block (flax: tpuseg/models/ocr.py; torch: OCR_block +
    SpatialOCR/ObjectAttention, ocrnet.py:42-91, ocr_utils.py)."""
    table = {
        "conv3x3_ocr/conv": "conv3x3_ocr.0",
        "conv3x3_ocr/norm": "conv3x3_ocr.1.0",
        "aux0/conv": "aux_head.0",
        "aux0/norm": "aux_head.1.0",
        "aux_cls": "aux_head.2",
        "cls": "cls_head",
        "ocr_distri/conv_bn/conv": "ocr_distri_head.conv_bn_dropout.0",
        "ocr_distri/conv_bn/norm": "ocr_distri_head.conv_bn_dropout.1.0",
    }
    if flax_path in table:
        return table[flax_path]
    m = re.match(r"ocr_distri/object_context/f_(pixel|object)(\d)/(conv|norm)$",
                 flax_path)
    if m:
        which, idx, kind = m.groups()
        seq = int(idx) * 2
        sub = f"{seq}" if kind == "conv" else f"{seq + 1}.0"
        return f"ocr_distri_head.object_context_block.f_{which}.{sub}"
    m = re.match(r"ocr_distri/object_context/f_(down|up)/(conv|norm)$",
                 flax_path)
    if m:
        which, kind = m.groups()
        sub = "0" if kind == "conv" else "1.0"
        return f"ocr_distri_head.object_context_block.f_{which}.{sub}"
    return None


def _attn_head_torch_prefix(flax_path: str) -> str | None:
    """AttnHead (flax: layers.py AttnHead; torch: make_attn_head OrderedDict
    names conv0/bn0/conv1/bn1/conv2, network/utils.py:343-367)."""
    table = {
        "conv0/conv": "conv0", "conv0/norm": "bn0",
        "conv1/conv": "conv1", "conv1/norm": "bn1",
        "cls": "conv2",
    }
    return table.get(flax_path)


def flax_to_torch_key(flax_path: str) -> str | None:
    """Full-model mapping for ocrnet.HRNet_Mscale / ocrnet.HRNet."""
    if flax_path.startswith("backbone/"):
        sub = _hrnet_torch_prefix(flax_path[len("backbone/"):])
        return f"backbone.{sub}" if sub else None
    if flax_path.startswith("ocr/"):
        sub = _ocr_torch_prefix(flax_path[len("ocr/"):])
        return f"ocr.{sub}" if sub else None
    if flax_path.startswith("scale_attn/"):
        sub = _attn_head_torch_prefix(flax_path[len("scale_attn/"):])
        return f"scale_attn.{sub}" if sub else None
    return None


# ---------------------------------------------------------------------------
# ImageNet trunk checkpoints (reference pretrained loads:
# wider_resnet.py:399-435, hrnetv2.py:451-477, Resnet.py:44-50,
# SEresnext.py:44-67, xception.py:270-279)
# ---------------------------------------------------------------------------

def _wrn38_torch_prefix(p: str) -> str | None:
    """flax WRN38 (tpuseg/models/wider_resnet.py) -> wider_resnet38.pth.tar
    keys after 'module.' strip (reference: wider_resnet.py:290-361; BN lives
    in bnrelu Sequentials, index 0)."""
    if p == "mod1_conv1":
        return "mod1.conv1"
    m = re.match(r"mod(\d)_block(\d+)/(.+)$", p)
    if not m:
        return None
    mod, blk, rest = m.groups()
    base = f"mod{mod}.block{blk}"
    if rest == "bn1":
        return f"{base}.bn1.0"
    if rest == "proj_conv":
        return f"{base}.proj_conv"
    m = re.match(r"conv(\d)$", rest)
    if m:
        return f"{base}.convs.conv{m.group(1)}"
    m = re.match(r"bn([23])$", rest)
    if m:
        return f"{base}.convs.bn{m.group(1)}.0"
    return None


def _resnet_block_sub(rest: str) -> str | None:
    if rest == "downsample_conv":
        return "downsample.0"
    if rest == "downsample_bn":
        return "downsample.1"
    if re.match(r"(conv|bn)\d$", rest):
        return rest
    return None


def _resnet_torch_prefix(p: str) -> str | None:
    """flax ResNet (tpuseg/models/resnet.py) -> torchvision/model-zoo keys
    (reference: network/Resnet.py:94-194)."""
    if p in ("conv1", "bn1"):
        return p
    m = re.match(r"layer(\d)_block(\d+)/(.+)$", p)
    if not m:
        return None
    layer, blk, rest = m.groups()
    sub = _resnet_block_sub(rest)
    return f"layer{layer}.{blk}.{sub}" if sub else None


def _seresnext_torch_prefix(p: str) -> str | None:
    """flax SEResNeXt (tpuseg/models/seresnext.py) -> Cadene pretrained keys
    (reference: network/SEresnext.py:170-360; stem under layer0, SE module
    fc convs under se_module)."""
    if p == "conv1":
        return "layer0.conv1"
    if p == "bn1":
        return "layer0.bn1"
    m = re.match(r"layer(\d)_block(\d+)/(.+)$", p)
    if not m:
        return None
    layer, blk, rest = m.groups()
    base = f"layer{layer}.{blk}"
    m = re.match(r"se/fc(\d)$", rest)
    if m:
        return f"{base}.se_module.fc{m.group(1)}"
    sub = _resnet_block_sub(rest)
    return f"{base}.{sub}" if sub else None


# whether each reference xception Block starts with a ReLU in its `rep`
# Sequential (start_with_relu, reference: xception.py:120-135): block1/2
# pass start_with_relu=False, everything else True
_XCEPTION_NO_RELU_BLOCKS = {1, 2}


def _xception_torch_prefix(p: str) -> str | None:
    """flax Xception71 (tpuseg/models/xception.py) -> aligned_xception71.pth
    keys (reference: network/xception.py:24-107,110-200). Sequential `rep`
    packs [relu, SeparableConv2d, BatchNorm] triples, so positional indices
    depend on start_with_relu."""
    if re.match(r"(conv|bn)[12]$", p):
        return p
    # exit-flow separable convs conv3..conv5 + bn3..bn5
    m = re.match(r"conv([345])/(depthwise|bn|pointwise)$", p)
    if m:
        i, sub = m.groups()
        part = {"depthwise": "conv1", "bn": "bn", "pointwise": "pointwise"}
        return f"conv{i}.{part[sub]}"
    m = re.match(r"bn([345])$", p)
    if m:
        return f"bn{m.group(1)}"
    m = re.match(r"block(\d+)/(.+)$", p)
    if not m:
        return None
    blk, rest = int(m.group(1)), m.group(2)
    base = f"block{blk}"
    if rest == "skip_conv":
        return f"{base}.skip"
    if rest == "skip_bn":
        return f"{base}.skipbn"
    swr = blk not in _XCEPTION_NO_RELU_BLOCKS
    m = re.match(r"sep(\d+)/(depthwise|bn|pointwise)$", rest)
    if m:
        k, sub = int(m.group(1)), m.group(2)
        idx = 3 * k + (1 if swr else 0)
        part = {"depthwise": "conv1", "bn": "bn", "pointwise": "pointwise"}
        return f"{base}.rep.{idx}.{part[sub]}"
    m = re.match(r"sepbn(\d+)$", rest)
    if m:
        k = int(m.group(1))
        idx = 3 * k + (2 if swr else 1)
        return f"{base}.rep.{idx}"
    return None


def _efficientnet_torch_prefix(p: str) -> str | None:
    """flax EfficientNetB4 (tpuseg/models/efficientnet.py) -> timm/geffnet
    efficientnet_b4 checkpoint naming (conv_stem/bn1/blocks.{s}.{b}.*).
    No in-env numerics oracle exists: the reference's own efficientnet_b4
    path is dead code (network/utils.py:102-141 has no branch for it) and
    geffnet/timm are not installed — this map is written to the published
    naming convention so released weights convert mechanically."""
    if p in ("conv_stem", "bn1"):
        return p
    m = re.match(r"blocks_(\d+)_(\d+)/(.+)$", p)
    if m:
        s, b, rest = m.groups()
        rest = rest.replace("se/", "se.")
        return f"blocks.{s}.{b}.{rest}"
    return None


def _aspp_torch_prefix(p: str) -> str | None:
    """flax ASPP (tpuseg/models/heads.py) -> reference
    AtrousSpatialPyramidPoolingModule (network/utils.py:162-218):
    features ModuleList of Sequential(conv, BN, ReLU); img_conv separate."""
    table = {"img_conv/conv": "img_conv.0", "img_conv/norm": "img_conv.1"}
    if p in table:
        return table[p]
    m = re.match(r"branch(\d)/(conv|norm)$", p)
    if m:
        i, kind = m.groups()
        return f"features.{i}.{'0' if kind == 'conv' else '1'}"
    return None


def deepv3_key_fn(trunk: str):
    """Full-model mapping for deepv3.DeepV3Plus* checkpoints
    (reference: network/deepv3.py:40-93). The trunk sub-map depends on the
    arch's trunk; resnet stems live under the get_resnet 'layer0'
    positional Sequential inside seg checkpoints (utils.py:58-63)."""
    trunk_fn = TRUNK_KEY_FNS[trunk]

    def trunk_sub(p: str) -> str | None:
        sub = trunk_fn(p)
        if sub is None:
            return None
        if trunk.startswith("resnet"):
            if sub.startswith("conv1"):
                sub = "layer0.0" + sub[len("conv1"):]
            elif sub.startswith("bn1"):
                sub = "layer0.1" + sub[len("bn1"):]
        return sub

    head_table = {
        "bot_fine": "bot_fine", "bot_aspp": "bot_aspp",
        "final1/conv": "final.0", "final1/norm": "final.1",
        "final2/conv": "final.3", "final2/norm": "final.4",
        "final_cls": "final.6",
    }

    def key_fn(flax_path: str) -> str | None:
        if flax_path.startswith("backbone/"):
            sub = trunk_sub(flax_path[len("backbone/"):])
            return f"backbone.{sub}" if sub else None
        if flax_path.startswith("aspp/"):
            sub = _aspp_torch_prefix(flax_path[len("aspp/"):])
            return f"aspp.{sub}" if sub else None
        return head_table.get(flax_path)

    return key_fn


TRUNK_KEY_FNS = {
    "wrn38": _wrn38_torch_prefix,
    "resnet-50": _resnet_torch_prefix,
    "resnet-101": _resnet_torch_prefix,
    "seresnext-50": _seresnext_torch_prefix,
    "seresnext-101": _seresnext_torch_prefix,
    "xception71": _xception_torch_prefix,
    "efficientnet_b4": _efficientnet_torch_prefix,
    # HRNet ImageNet checkpoint uses the seg-model keys without the
    # 'backbone.' prefix ('model.'/'last_layer' remaps happen in
    # _strip_prefixes, matching hrnetv2.py:467-469)
    "hrnetv2": _hrnet_torch_prefix,
}


def trunk_key_fn(trunk_name: str, flax_prefix: str = "backbone/"):
    """key_fn for convert_state_dict: maps the flax ``backbone/`` subtree
    onto a trunk-only ImageNet checkpoint; non-backbone paths (ocr, heads)
    return None and keep their fresh init — exactly the reference's
    trunk-pretrained initialization for training recipes."""
    fn = TRUNK_KEY_FNS[trunk_name]

    def key_fn(flax_path: str) -> str | None:
        if flax_prefix and not flax_path.startswith(flax_prefix):
            return None
        return fn(flax_path[len(flax_prefix):])

    return key_fn


# ---------------------------------------------------------------------------
# tensor conversion
# ---------------------------------------------------------------------------

def convert_conv_weight(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO. The same transpose covers depthwise convs
    too: torch (C,1,H,W) -> flax (H,W,1,C) is the identical axis
    permutation, so no grouped-conv special case is needed."""
    return np.transpose(w, (2, 3, 1, 0))


def _strip_prefixes(state_dict: dict) -> dict:
    """The reference's own ckpt cleanups: DataParallel 'module.' prefixes
    and HRNet 'model.'/'last_layer' remaps (hrnetv2.py:467-469,
    wider_resnet.py:406-412). Prefixes are stripped only at the key START:
    a substring replace would corrupt e.g. SEResNeXt's 'se_module.' keys."""
    out = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        k = k.replace("last_layer", "aux_head")
        out[k] = v
    return out


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = v
    return out


def _unflatten(flat):
    out: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def convert_state_dict(torch_state: Dict[str, np.ndarray],
                       flax_params: dict, flax_stats: dict,
                       key_fn=flax_to_torch_key, strict: bool = True,
                       strict_prefix: str = "",
                       log=print) -> Tuple[dict, dict]:
    """Fill flax params/batch_stats from a torch state dict.

    For each flax leaf, derive the torch key via ``key_fn`` on the module
    path plus the leaf-name suffix convention:
      kernel -> .weight (transposed), bias -> .bias,
      bn scale -> .weight, bn bias -> .bias,
      bn mean/var -> .running_mean / .running_var.
    """
    torch_state = _strip_prefixes(torch_state)
    new_params = {}
    new_stats = {}
    missing = []

    def leaf_key(flat_key: str, collection: str):
        parts = flat_key.split("/")
        leaf = parts[-1]
        # flax BN is 'bn' inside our Norm wrapper: strip only that innermost
        # component (a blanket p != 'bn' filter would also eat Norm modules
        # that are themselves NAMED 'bn', e.g. SeparableConv's 'sep0/bn/bn')
        mod_parts = parts[:-1]
        if mod_parts and mod_parts[-1] == "bn" and leaf in (
                "scale", "bias", "mean", "var"):
            mod_parts = mod_parts[:-1]
        mod_path = "/".join(mod_parts)
        torch_prefix = key_fn(mod_path)
        if torch_prefix is None:
            return None
        if collection == "params":
            suffix = {"kernel": "weight", "scale": "weight",
                      "bias": "bias"}[leaf]
        else:
            suffix = {"mean": "running_mean", "var": "running_var"}[leaf]
        return f"{torch_prefix}.{suffix}"

    for flat_key, val in _flatten(flax_params).items():
        tk = leaf_key(flat_key, "params")
        if tk is None or tk not in torch_state:
            missing.append((flat_key, tk))
            new_params[flat_key] = val
            continue
        w = np.asarray(torch_state[tk])
        if flat_key.endswith("kernel") and w.ndim == 4:
            w = convert_conv_weight(w)
        assert w.shape == val.shape, (flat_key, tk, w.shape, val.shape)
        new_params[flat_key] = w.astype(np.asarray(val).dtype)

    for flat_key, val in _flatten(flax_stats).items():
        tk = leaf_key(flat_key, "stats")
        if tk is None or tk not in torch_state:
            missing.append((flat_key, tk))
            new_stats[flat_key] = val
            continue
        w = np.asarray(torch_state[tk])
        assert w.shape == val.shape, (flat_key, tk, w.shape, val.shape)
        new_stats[flat_key] = w.astype(np.asarray(val).dtype)

    # with strict_prefix only leaves under it must map (trunk-only
    # conversion: heads keep fresh init, like the reference's ImageNet load)
    relevant = [mk for mk in missing if mk[0].startswith(strict_prefix)]
    if missing:
        for fk, tk in relevant[:20]:
            log(f"unmatched: {fk} -> {tk}")
        log(f"{len(missing)} unmatched leaves "
            f"({len(new_params) + len(new_stats) - len(missing)} converted)")
        if strict and relevant:
            raise KeyError(f"{len(relevant)} unmatched leaves")
    return _unflatten(new_params), _unflatten(new_stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ocrnet.HRNet_Mscale")
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--lenient", action="store_true")
    ap.add_argument("--trunk", default=None,
                    help="convert a trunk-only ImageNet checkpoint "
                         "(wrn38 | resnet-50 | resnet-101 | seresnext-50 | "
                         "seresnext-101 | xception71 | hrnetv2) onto the "
                         "model's backbone; heads keep fresh init")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from tpuseg.config import make_config
    from tpuseg.models import get_model

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    state = {k: v.numpy() for k, v in state.items()}

    cfg = make_config({"model.arch": args.arch,
                       "dataset.num_classes": args.num_classes})
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.bfloat16))

    key_fn = trunk_key_fn(args.trunk) if args.trunk else flax_to_torch_key
    params, stats = convert_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        key_fn=key_fn, strict=not args.lenient,
        strict_prefix="backbone/" if args.trunk else "")

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out),
               {"params": params, "batch_stats": stats})
    ckptr.wait_until_finished()
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
