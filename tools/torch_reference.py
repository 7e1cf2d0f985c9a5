"""Build the ACTUAL torch reference network in this environment.

The reference (/root/reference) is importable on CPU once its two
non-importable deps are stubbed (VERDICT r1 item 2):
- ``apex.amp`` (network/mynn.py:10): under opt-level O0 its decorators and
  cast guards are no-ops, so no-op stubs are semantically exact;
- ``runx.logx`` (network/hrnetv2.py:22 etc.): logging only;
- ``torchvision`` (utils/misc.py:39-40): imported at module scope by
  utils/misc.py but only *used* inside ImageDumper, which we never touch.

Used by tests/test_torch_parity.py to prove end-to-end numerical parity of
the converted flax model against the real ``ocrnet.HRNet_Mscale``
(reference: network/ocrnet.py:158-334) — the converter's correctness
oracle for the 86.92-mIoU path.

As __main__, dumps a random-init reference state_dict plus forward outputs
(single-scale _fwd, eval two_scale_forward, eval nscale_forward) to .npz:

  python tools/torch_reference.py --out /tmp/ref_dump --height 64 --width 128
"""
from __future__ import annotations

import argparse
import contextlib
import os
import sys
import types

REFERENCE = os.environ.get("TPUSEG_REFERENCE", "/root/reference")


def install_stubs():
    """Register apex/runx/torchvision stand-ins in sys.modules."""
    import numpy as np
    import torch
    import torch.nn as nn

    # the reference RMI loss hardcodes CUDA tensor types
    # (loss/rmi.py:171-172 ``.type(torch.cuda.DoubleTensor)``); on the
    # CPU-only torch in this env that raises at runtime. Same shim as
    # tests/test_rmi.py:136 — semantically exact (dtype cast, device-free).
    torch.cuda.DoubleTensor = torch.DoubleTensor
    torch.cuda.FloatTensor = torch.FloatTensor

    # the reference predates numpy 2.x: restore the removed scalar aliases
    # it uses (network/hrnetv2.py:315 np.int, utils/f_boundary.py:193 np.bool)
    for alias, builtin in (("int", int), ("float", float), ("bool", bool),
                           ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)

    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        amp = types.ModuleType("apex.amp")
        # under AMP O0 these are identity decorators / no-op guards
        amp.float_function = lambda fn: fn
        amp.half_function = lambda fn: fn

        @contextlib.contextmanager
        def _noop(*a, **k):
            yield

        amp.disable_casts = _noop
        par = types.ModuleType("apex.parallel")
        par.SyncBatchNorm = nn.BatchNorm2d
        apex.amp = amp
        apex.parallel = par
        sys.modules.update({"apex": apex, "apex.amp": amp,
                            "apex.parallel": par})

    if "runx" not in sys.modules:
        class _Logx:
            def __getattr__(self, name):
                return lambda *a, **k: None

        runx = types.ModuleType("runx")
        logx = types.ModuleType("runx.logx")
        logx.logx = _Logx()
        runx.logx = logx
        sys.modules.update({"runx": runx, "runx.logx": logx})

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        ut = types.ModuleType("torchvision.utils")
        tv.transforms = tr
        tv.utils = ut
        sys.modules.update({"torchvision": tv,
                            "torchvision.transforms": tr,
                            "torchvision.utils": ut})


def reference_cfg(num_classes: int = 19, n_scales=None):
    """Import the reference's global cfg, mutated for in-env CPU use.

    Must run BEFORE any ``network.*`` import: hrnetv2.init_weights binds
    cfg.MODEL.HRNET_CHECKPOINT as a default argument at class-definition
    time (network/hrnetv2.py:451), so the no-pretrained override has to be
    in place first.
    """
    install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    from config import cfg  # the reference's global AttrDict

    cfg.immutable(False)
    cfg.MODEL.HRNET_CHECKPOINT = ""  # no ImageNet weights in this env
    cfg.MODEL.BNFUNC = torch.nn.BatchNorm2d
    # normally set by assert_and_infer_cfg (config.py:214); ResizeX branches
    # on it for recompute_scale_factor (network/mynn.py:106)
    cfg.OPTIONS.TORCH_VERSION = float(".".join(
        torch.__version__.split(".")[:2]))
    cfg.DATASET.NUM_CLASSES = num_classes
    cfg.MODEL.N_SCALES = list(n_scales) if n_scales else None
    return cfg


def _neuter_pretrained_loads():
    """Make every get_trunk path constructible without pretrained files /
    model-zoo downloads (zero egress): patch the factory names get_trunk
    resolves (network/utils.py:102-141)."""
    import network.Resnet as Resnet
    import network.SEresnext as SE
    import network.utils as nutils
    import network.wider_resnet as wr
    import network.xception as xc

    nutils.wrn38 = lambda pretrained=True: wr.wrn38(pretrained=False)
    nutils.xception71 = lambda **kw: xc.xception71(
        **{**kw, "pretrained": False})
    nutils.resnet50 = lambda: Resnet.resnet50(pretrained=False)
    nutils.resnet101 = lambda: Resnet.resnet101(pretrained=False)
    SE.initialize_pretrained_model = lambda *a, **k: None


def _shrink_to_tiny(cfg):
    """Mutate the reference's (mutable, pre-freeze) global cfg so
    ``ocrnet.HRNet_Mscale`` builds the exact topology of our
    ``HRNet_Mscale_Tiny`` (tpuseg/models/hrnet.py TINY_SPEC + mid 32 /
    key 16 / attn bot 16). The reference's HRNet is fully config-driven
    (config.py:161-190, network/utils.py:321,344), so a tiny REFERENCE
    model is constructible — giving a train-parity oracle that compiles
    in seconds instead of the W48 oracle's ~13 CPU-minutes."""
    E = cfg.MODEL.OCR_EXTRA
    E.STAGE1.NUM_BLOCKS = [1]
    E.STAGE1.NUM_CHANNELS = [8]
    E.STAGE2.NUM_MODULES = 1
    E.STAGE2.NUM_BLOCKS = [1, 1]
    E.STAGE2.NUM_CHANNELS = [8, 16]
    E.STAGE3.NUM_MODULES = 1
    E.STAGE3.NUM_BLOCKS = [1, 1, 1]
    E.STAGE3.NUM_CHANNELS = [8, 16, 32]
    E.STAGE4.NUM_MODULES = 1
    E.STAGE4.NUM_BLOCKS = [1, 1, 1, 1]
    E.STAGE4.NUM_CHANNELS = [8, 16, 32, 64]
    cfg.MODEL.OCR.MID_CHANNELS = 32
    cfg.MODEL.OCR.KEY_CHANNELS = 16
    cfg.MODEL.SEGATTN_BOT_CH = 16


def build_reference_model(arch: str = "ocrnet.HRNet_Mscale",
                          num_classes: int = 19, n_scales=None,
                          seed: int = 0, tiny: bool = False):
    """Instantiate a reference network factory on CPU with random init."""
    cfg = reference_cfg(num_classes, n_scales)
    if tiny:
        _shrink_to_tiny(cfg)
    import importlib

    import torch

    _neuter_pretrained_loads()
    torch.manual_seed(seed)
    mod_name, fn_name = arch.split(".")
    mod = importlib.import_module(f"network.{mod_name}")
    net = getattr(mod, fn_name)(num_classes, criterion=None)
    net.eval()
    return net, cfg


def build_reference_trunk(name: str, seed: int = 0):
    """Instantiate a reference trunk WITHOUT its pretrained load (the files
    and model-zoo URLs are unavailable in-env). The pretrained-loading code
    paths these bypass are exactly what the converter key maps re-implement:
    wider_resnet.py:399-412, Resnet.py:44-50 + utils.py:48-99,
    SEresnext.py:365-406, xception.py:270-279."""
    reference_cfg()
    import torch

    torch.manual_seed(seed)
    if name == "wrn38":
        import network.wider_resnet as wr

        net = wr.wrn38(pretrained=False)
    elif name == "xception71":
        import network.xception as xc
        from network.mynn import Norm2d

        net = xc.xception71(output_stride=8, BatchNorm=Norm2d,
                            pretrained=False)
    elif name in ("resnet-50", "resnet-101",
                  "seresnext-50", "seresnext-101"):
        import network.Resnet as Resnet
        import network.SEresnext as SE
        import network.utils as nutils

        # zero egress: neuter the model-zoo downloads, keep the module
        # surgery (get_resnet stride-8 rewrite) intact
        nutils.resnet50 = lambda: Resnet.resnet50(pretrained=False)
        nutils.resnet101 = lambda: Resnet.resnet101(pretrained=False)
        SE.initialize_pretrained_model = lambda *a, **k: None
        net = nutils.get_resnet(name, output_stride=8)
    else:
        raise ValueError(name)
    net.eval()
    return net


def trunk_state_dict_numpy(name: str, net) -> dict:
    """state_dict in the PRETRAINED-FILE naming each trunk's checkpoint
    ships with (what the converter consumes)."""
    state = state_dict_numpy(net)
    if name.startswith("resnet"):
        # get_resnet wraps the torchvision-style stem in a positional
        # Sequential; the model-zoo files use conv1/bn1 (utils.py:58-63)
        out = {}
        for k, v in state.items():
            if k.startswith("layer0.0."):
                k = "conv1." + k[len("layer0.0."):]
            elif k.startswith("layer0.1."):
                k = "bn1." + k[len("layer0.1."):]
            out[k] = v
        return out
    if name == "wrn38":
        # the shipped wider_resnet38.pth.tar carries DataParallel prefixes
        # (wider_resnet.py:406); reproduce them to exercise the strip
        return {f"module.{k}": v for k, v in state.items()}
    return state


def state_dict_numpy(net) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()
            if v is not None and v.dtype.is_floating_point or
            "running" in k}


def randomize_bn(net, seed: int = 0):
    """Give every BatchNorm distinguishable affine params and running stats
    before dumping (VERDICT r2 weak #1): at torch init weight=1, bias=0,
    running_mean=0, running_var=1, so a converter that swapped scale<->var
    (both all-ones) or bias<->mean (both zeros) would pass every parity
    test and silently corrupt real trained checkpoints. Randomizing makes
    the dumped forward outputs sensitive to each of the four BN leaves
    individually (tests/test_torch_parity.py proves it by mutation)."""
    import torch

    g = torch.Generator().manual_seed(seed + 7777)
    for mod in net.modules():
        if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
            with torch.no_grad():
                if mod.weight is not None:
                    mod.weight.uniform_(0.5, 1.5, generator=g)
                if mod.bias is not None:
                    mod.bias.uniform_(-0.5, 0.5, generator=g)
                if mod.running_mean is not None:
                    mod.running_mean.uniform_(-0.5, 0.5, generator=g)
                if mod.running_var is not None:
                    mod.running_var.uniform_(0.5, 1.5, generator=g)


def randomize_convs(net, seed: int = 0):
    """Re-init every conv with kaiming_normal before a TRAIN dump.

    The reference's HRNet trunk init is normal(std=0.001)
    (network/hrnetv2.py:457-458). At that init every BN re-normalizes a
    ~0.001-std activation back to unit scale, so the BACKWARD is amplified
    by ~1/std per layer — measured: a 1e-7 relative input perturbation
    changes the reference's own gradients by 2.3e-3 on the tiny topology
    and O(1) at W48 depth. Gradients at that init are chaotic; no
    cross-framework oracle can compare them. Conditioning the weights
    (sane activation scales, O(1) BN batch stats) makes the train-path
    gradient comparison well-posed while exercising exactly the same
    converter key map. Eval dumps keep the original init — the forward
    is self-normalizing and not chaotic."""
    import torch

    g = torch.Generator().manual_seed(seed + 31337)
    for mod in net.modules():
        if isinstance(mod, torch.nn.Conv2d):
            with torch.no_grad():
                fan_in = (mod.in_channels // mod.groups
                          * mod.kernel_size[0] * mod.kernel_size[1])
                std = (2.0 / max(fan_in, 1)) ** 0.5
                mod.weight.normal_(0.0, std, generator=g)
                if mod.bias is not None:
                    mod.bias.uniform_(-0.1, 0.1, generator=g)


def zero_dropout(net):
    """Deterministic train-mode forward: torch and flax draw dropout masks
    from different RNGs, so train parity is only comparable with dropout
    off (rate 0, still train-mode BN)."""
    import torch

    for mod in net.modules():
        if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
            mod.p = 0.0


def train_dump(args):
    """Dump the reference TRAIN computation for one step: two-scale train
    forward (network/ocrnet.py:264-318 train branch) + criterion
    composition (loss = OCR_ALPHA*aux + main, ocrnet.py:300-311) +
    backward. Saved artifacts: pre-step state_dict, input/labels, loss
    scalar, per-parameter gradients, and the post-forward BN running stats
    (torch updates them inside the train forward, once per _fwd pass)."""
    import numpy as np
    import torch

    net, cfg = build_reference_model(args.arch, args.num_classes, None,
                                     args.seed, tiny=args.tiny)
    randomize_bn(net, args.seed)
    if args.tiny:
        # Conditioning is what makes the tiny GRADIENT oracle well-posed
        # (see randomize_convs). At W48 depth the train-mode backward is
        # chaotic at ANY random init (measured: conditioning makes the
        # forward noisier, 1.7e-4 -> 1.8e-3 loss rel), so W48 train dumps
        # keep the reference's own init and are asserted on loss + BN
        # stats only; W48 gradients are oracle-tested in EVAL mode
        # (eval_grad_dump below), where the backward is affine in BN and
        # not chaotic.
        randomize_convs(net, args.seed)
    zero_dropout(net)

    if args.criterion == "rmi":
        from loss.rmi import RMILoss

        criterion = RMILoss(num_classes=args.num_classes,
                            ignore_index=cfg.DATASET.IGNORE_LABEL)
    else:
        from loss.utils import CrossEntropyLoss2d

        criterion = CrossEntropyLoss2d(
            ignore_index=cfg.DATASET.IGNORE_LABEL)
    net.criterion = criterion
    net.train()

    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "state_dict.npz"),
             **state_dict_numpy(net))

    rng = np.random.RandomState(args.seed)
    x_np = rng.uniform(-2.0, 2.0,
                       (args.batch, 3, args.height,
                        args.width)).astype(np.float32)
    gts_np = rng.randint(0, args.num_classes,
                         (args.batch, args.height,
                          args.width)).astype(np.int64)
    # ~10% ignore pixels exercise the valid-mask paths of every loss
    ignore = rng.uniform(size=gts_np.shape) < 0.1
    gts_np[ignore] = cfg.DATASET.IGNORE_LABEL

    loss = net({"images": torch.from_numpy(x_np),
                "gts": torch.from_numpy(gts_np)})
    loss.backward()

    grads = {name: p.grad.detach().numpy()
             for name, p in net.named_parameters() if p.grad is not None}
    post_stats = {k: v.detach().numpy()
                  for k, v in net.state_dict().items() if "running_" in k}
    np.savez(os.path.join(args.out, "train.npz"),
             x=x_np, gts=gts_np, loss=np.float64(loss.item()))
    np.savez(os.path.join(args.out, "grads.npz"), **grads)
    np.savez(os.path.join(args.out, "post_stats.npz"), **post_stats)
    print(f"dumped train step ({args.criterion}) to {args.out}: "
          f"loss={loss.item():.6f}")


def _install_val_loop_stubs():
    """Extra stand-ins the reference DATA path needs (beyond install_stubs):

    - ``skimage``: imported at module scope by transforms/transforms.py:36-44
      (gaussian blur / bilateral / boundaries) — none of it runs in the val
      pipeline, so empty callables are exact;
    - real ``torchvision.transforms`` stand-ins for the TWO transforms the
      reference val input pipeline composes (datasets/__init__.py:110-113):
      ToTensor (PIL -> CHW f32 / 255) and Normalize ((x - mean) / std, f32)
      — implemented to torchvision's documented semantics, the identical
      f32 op sequence as tpuseg.data.transforms.to_normalized_array;
    - CPU shims: the val loop hardcodes ``.cuda()`` moves
      (trnval_utils.py:131,165) — identity on the CPU-only torch here.
    """
    import sys
    import types

    import numpy as np
    import torch

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        for sub, names in (("filters", ["gaussian"]),
                           ("restoration", ["denoise_bilateral"]),
                           ("segmentation", ["find_boundaries"])):
            m = types.ModuleType(f"skimage.{sub}")
            for n in names:
                setattr(m, n, lambda *a, **k: None)
            setattr(sk, sub, m)
            sys.modules[f"skimage.{sub}"] = m
        sys.modules["skimage"] = sk

    tr = sys.modules["torchvision.transforms"]

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, pil):
            arr = np.asarray(pil, np.uint8)
            t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
            return t.float().div(255.0)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
            self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

        def __call__(self, t):
            return (t - self.mean) / self.std

    tr.Compose, tr.ToTensor, tr.Normalize = Compose, ToTensor, Normalize

    torch.Tensor.cuda = lambda self, *a, **k: self


def val_dump(args):
    """Drive the reference's ACTUAL composed val loop over a miniature
    cityscapes tree and dump the accumulated confusion matrix.

    This is ``validate()`` (train.py:536-597) minus the ImageDumper and
    checkpoint bookkeeping — i.e. exactly its metric composition: the
    reference's own val Loader (datasets/cityscapes.py:105-168 +
    base_loader.py:189-231, ToTensor+Normalize input path,
    datasets/__init__.py:110-156) -> the REAL ``eval_minibatch``
    (trnval_utils.py:82-198: outer flip x avgpool-scale loop, in-model
    mscale forward per pass, pre-softmax averaging, softmax -> argmax on
    host) -> ``iou_acc += fast_hist`` (misc.py:50-75) ->
    ``calculate_iou`` (misc.py:78-99). tpuseg's ``evaluate_only`` must
    reproduce the summed hist from converted weights
    (tests/test_val_loop_oracle.py)."""
    import numpy as np
    import torch

    cfg = reference_cfg(args.num_classes)
    if args.tiny:
        _shrink_to_tiny(cfg)
    _install_val_loop_stubs()
    cfg.DATASET.NAME = "cityscapes"
    cfg.DATASET.CITYSCAPES_DIR = args.data_root
    cfg.DATASET.CV = 0
    cfg.DATASET.CV_SPLITS = 3  # assert_and_infer_cfg default, config.py:264
    cfg.DATASET.CLASS_UNIFORM_PCT = 0.0  # val never samples centroids
    # assert_and_infer_cfg sets this from the arch name (config.py:269);
    # eval_minibatch branches on it for per-scale asset naming
    cfg.MODEL.MSCALE = "mscale" in args.arch.lower()

    _neuter_pretrained_loads()
    torch.manual_seed(args.seed)
    import importlib

    mod_name, fn_name = args.arch.split(".")
    mod = importlib.import_module(f"network.{mod_name}")
    net = getattr(mod, fn_name)(args.num_classes, criterion=None)
    randomize_bn(net, args.seed)
    # at the reference's own 0.001-std init the argmax is one constant
    # class (final-bias dominated) — useless as a composition oracle;
    # kaiming-conditioned convs (same treatment as eval_grad_dump) give
    # spatially-varying predictions so flip/scale/softmax composition
    # mutations actually move the confusion matrix
    randomize_convs(net, args.seed)
    zero_dropout(net)
    net.eval()

    import torchvision.transforms as standard_transforms
    from torch.utils.data import DataLoader

    import datasets.cityscapes_labels as cityscapes_labels
    from datasets.cityscapes import Loader

    # numpy 2.x shim: the license-plate row (id -1 -> trainid -1,
    # cityscapes_labels.py) is a no-op on uint8 masks (-1 never matches a
    # byte), but numpy 2 raises on the out-of-bounds -1 assignment that
    # old numpy silently wrapped (base_loader.py:183). Dropping the
    # negative-id row is semantically identical.
    cityscapes_labels.label2trainid = {
        k: v for k, v in cityscapes_labels.label2trainid.items() if k >= 0}
    from loss.utils import CrossEntropyLoss2d
    from utils.misc import AverageMeter, calculate_iou
    from utils.trnval_utils import eval_minibatch

    # the exact val input pipeline of setup_loaders
    # (datasets/__init__.py:110-156): no joint transforms, ToTensor +
    # Normalize(ImageNet), MaskToTensor-equivalent label path
    val_input_transform = standard_transforms.Compose([
        standard_transforms.ToTensor(),
        standard_transforms.Normalize(cfg.DATASET.MEAN, cfg.DATASET.STD),
    ])
    # transforms/transforms.py MaskToTensor: PIL -> int64 tensor
    label_transform = lambda m: torch.from_numpy(  # noqa: E731
        np.array(m, np.int32)).long()
    val_set = Loader(mode="val", joint_transform_list=None,
                     img_transform=val_input_transform,
                     label_transform=label_transform)
    val_loader = DataLoader(val_set, batch_size=1, num_workers=0,
                            shuffle=False, drop_last=False)

    # the eval knobs eval_minibatch consumes (train.py flag surface)
    margs = argparse.Namespace(
        default_scale=1.0,
        multi_scale_inference=bool(args.extra_scales),
        extra_scales=args.extra_scales,
        do_flip=args.do_flip,
    )
    criterion = CrossEntropyLoss2d(ignore_index=cfg.DATASET.IGNORE_LABEL)

    # calibrate BN running stats on the actual val images (one cumulative
    # train-mode pass): with RANDOM running stats every deep activation is
    # dominated by a per-channel constant offset and the argmax collapses
    # to a single class network-wide — useless as a composition oracle.
    # True batch statistics re-center each BN, so predictions vary
    # spatially. Affine weight/bias keep their randomized values (the
    # converter-sensitivity property of randomize_bn), and the calibrated
    # stats are dumped in state_dict.npz like any trained checkpoint's.
    for m in net.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.momentum = None
            m.reset_running_stats()
            m.train()
    with torch.no_grad():
        for data in val_loader:
            net({"images": data[0]})
    net.eval()

    val_loss = AverageMeter()
    iou_acc = 0
    preds, names = [], []
    with torch.no_grad():
        for val_idx, data in enumerate(val_loader):
            assets, _iou_acc = eval_minibatch(
                data, net, criterion, val_loss, True, margs, val_idx)
            iou_acc += _iou_acc  # the validate() accumulation, train.py:573
            preds.append(assets["predictions"][0])
            names.append(data[2][0])

    iu, acc, acc_cls = calculate_iou(iou_acc)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "state_dict.npz"),
             **state_dict_numpy(net))
    np.savez(os.path.join(args.out, "val_oracle.npz"),
             iou_acc=np.asarray(iou_acc, np.int64),
             iu=iu, acc=acc, acc_cls=acc_cls,
             mean_iu=np.nanmean(iu),
             val_loss=val_loss.avg,
             preds=np.stack(preds),
             names=np.asarray(names))
    print(f"dumped composed val loop ({len(names)} images, "
          f"flip={args.do_flip}, extra_scales={args.extra_scales!r}) "
          f"to {args.out}: mean_iu={np.nanmean(iu):.6f}")


def eval_grad_dump(args):
    """Dump an EVAL-mode n-scale backward: the W48-scale gradient oracle.

    Train-mode gradients at W48 depth are chaotic at any random init (the
    batch-stat normalization chain amplifies f32 noise exponentially — see
    randomize_convs), so full-depth gradient parity is asserted on the
    eval path instead: BN is affine in eval mode (fixed running stats), so
    the backward is well-conditioned at a kaiming-conditioned init. The
    readout is a fixed random cotangent on nscale_forward's fused 'pred'
    (reference: ocrnet.py:185-262) — this exercises the full W48 backward
    (convs, resizes incl. 2.0x, OCR attention, n-scale fusion chain) plus
    the converter's gradient mapping; the train-only pieces it omits
    (batch-stat backward, criterion composition) are covered by the tiny
    train dump and the criterion oracles (tests/test_rmi.py)."""
    import numpy as np
    import torch

    net, cfg = build_reference_model(args.arch, args.num_classes,
                                     [0.5, 1.0, 2.0], args.seed,
                                     tiny=args.tiny)
    randomize_bn(net, args.seed)
    randomize_convs(net, args.seed)
    zero_dropout(net)
    net.eval()  # eval path; gradients still flow to params

    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "state_dict.npz"),
             **state_dict_numpy(net))

    rng = np.random.RandomState(args.seed)
    x_np = rng.uniform(-2.0, 2.0,
                       (args.batch, 3, args.height,
                        args.width)).astype(np.float32)
    out = net({"images": torch.from_numpy(x_np)})
    pred = out["pred"]
    ct_np = rng.randn(*pred.shape).astype(np.float32) / pred.numel()
    (pred * torch.from_numpy(ct_np)).sum().backward()

    grads = {name: p.grad.detach().numpy()
             for name, p in net.named_parameters() if p.grad is not None}
    np.savez(os.path.join(args.out, "eval_grad.npz"), x=x_np, ct=ct_np,
             pred=pred.detach().numpy())
    np.savez(os.path.join(args.out, "grads.npz"), **grads)
    print(f"dumped eval-mode nscale backward to {args.out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--arch", default="ocrnet.HRNet_Mscale")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trunk", default=None,
                    help="dump a bare trunk (state_dict in pretrained-file "
                         "naming + (s2, s4, high) forward outputs) instead "
                         "of the full model")
    ap.add_argument("--train-dump", action="store_true",
                    help="dump a TRAIN step (fwd+bwd): loss, gradients, "
                         "post-forward BN running stats")
    ap.add_argument("--val-dump", action="store_true",
                    help="drive the reference's composed val loop "
                         "(validate + eval_minibatch) over --data-root and "
                         "dump the accumulated confusion matrix")
    ap.add_argument("--data-root", default=None,
                    help="miniature cityscapes tree for --val-dump")
    ap.add_argument("--do-flip", action="store_true")
    ap.add_argument("--extra-scales", default="",
                    help="comma list for --val-dump outer avgpool scales, "
                         "e.g. '0.5,2.0' (empty = single-scale)")
    ap.add_argument("--eval-grad-dump", action="store_true",
                    help="dump an EVAL-mode nscale backward (the W48-depth "
                         "gradient oracle; see eval_grad_dump)")
    ap.add_argument("--criterion", default="rmi", choices=["rmi", "ce"],
                    help="criterion for --train-dump")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the reference cfg to the HRNet_Mscale_Tiny "
                         "topology (fast oracle)")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import numpy as np
    import torch

    if args.val_dump:
        assert args.data_root, "--val-dump needs --data-root"
        val_dump(args)
        return

    if args.train_dump:
        train_dump(args)
        return

    if args.eval_grad_dump:
        eval_grad_dump(args)
        return

    if args.trunk:
        net = build_reference_trunk(args.trunk, args.seed)
        randomize_bn(net, args.seed)
        os.makedirs(args.out, exist_ok=True)
        np.savez(os.path.join(args.out, "state_dict.npz"),
                 **trunk_state_dict_numpy(args.trunk, net))
        rng = np.random.RandomState(args.seed)
        x_np = rng.uniform(-2.0, 2.0,
                           (1, 3, args.height, args.width)).astype(np.float32)
        outs = {"x": x_np}
        with torch.no_grad():
            res = net(torch.from_numpy(x_np))
        for i, t in enumerate(res if isinstance(res, tuple) else (res,)):
            if torch.is_tensor(t):
                outs[f"out{i}"] = t.numpy()
        np.savez(os.path.join(args.out, "outputs.npz"), **outs)
        print(f"dumped {args.trunk} trunk to {args.out}")
        return

    net, cfg = build_reference_model(args.arch, args.num_classes, None,
                                     args.seed)
    randomize_bn(net, args.seed)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "state_dict.npz"),
             **state_dict_numpy(net))

    rng = np.random.RandomState(args.seed)
    x_np = rng.uniform(-2.0, 2.0,
                       (1, 3, args.height, args.width)).astype(np.float32)
    x = torch.from_numpy(x_np)
    outs = {"x": x_np}

    acts = {}

    def _hook(name):
        def fn(mod, inp, out):
            if torch.is_tensor(out):
                acts[name] = out.detach().numpy()
            elif isinstance(out, (tuple, list)):
                for i, o in enumerate(out):
                    if torch.is_tensor(o):
                        acts[f"{name}#{i}"] = o.detach().numpy()
        return fn

    handles = [mod.register_forward_hook(_hook(name))
               for name, mod in net.named_modules() if name]

    def _drop_hooks():
        # the multi-scale forwards below would otherwise re-fill `acts`
        # with several full activation sets that are never saved
        for h in handles:
            h.remove()
        acts.clear()

    with torch.no_grad():
        if hasattr(net, "_fwd"):  # mscale family
            single = net._fwd(x)  # reference ocrnet.py:170-183
            for k, v in single.items():
                outs[f"single/{k}"] = v.numpy()
            np.savez(os.path.join(args.out, "acts.npz"), **acts)
            _drop_hooks()

            cfg.MODEL.N_SCALES = None  # -> two_scale (ocrnet.py:330-332)
            two = net({"images": x})
            for k, v in two.items():
                outs[f"two/{k}"] = v.numpy()

            cfg.MODEL.N_SCALES = [0.5, 1.0, 2.0]  # -> nscale_forward
            ns = net({"images": x})
            for k, v in ns.items():
                outs[f"nscale/{k}"] = v.numpy()
        else:  # plain eval forward (deepv3 etc.)
            ev = net({"images": x})
            for k, v in ev.items():
                outs[f"eval/{k}"] = v.numpy()
            np.savez(os.path.join(args.out, "acts.npz"), **acts)
            _drop_hooks()

    np.savez(os.path.join(args.out, "outputs.npz"), **outs)
    print(f"dumped reference state_dict + outputs to {args.out}")


if __name__ == "__main__":
    main()
