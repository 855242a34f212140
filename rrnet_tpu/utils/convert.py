"""Dataset/format converters.

  * VisDrone -> COCO JSON (reference utils/data_type_convertor.py:7-153,
    12 categories including ignore(0) and others(11)).
  * PyTorch checkpoint -> flax params for the backbones (replaces the
    reference's pretrained-weight loaders, backbones/load.py:5-38):
    name-mapped, strict=False with a missing/unexpected report.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from rrnet_tpu.data.visdrone import VISDRONE_CLASS_NAMES


# ---------------------------------------------------------------------------
# VisDrone -> COCO
# ---------------------------------------------------------------------------

def visdrone_to_coco(root_dir: str, split: str, out_path: str) -> str:
    """Build a COCO-format JSON from a VisDrone split
    (utils/data_type_convertor.py semantics: all 12 categories, bbox
    xywh, iscrowd=0, area=w*h)."""
    from PIL import Image

    images_dir = os.path.join(root_dir, split, "images")
    annos_dir = os.path.join(root_dir, split, "annotations")
    names = sorted(os.path.splitext(f)[0] for f in os.listdir(images_dir)
                   if f.endswith(".jpg"))

    categories = [{"id": i, "name": n, "supercategory": "none"}
                  for i, n in enumerate(VISDRONE_CLASS_NAMES)]
    images, annotations = [], []
    ann_id = 1
    for img_id, name in enumerate(names, start=1):
        with Image.open(os.path.join(images_dir, name + ".jpg")) as im:
            w, h = im.size
        images.append({"id": img_id, "file_name": name + ".jpg",
                       "width": w, "height": h})
        path = os.path.join(annos_dir, name + ".txt")
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip().strip(",")
                    if not line:
                        continue
                    vals = [float(v) for v in line.split(",")[:8]]
                    annotations.append({
                        "id": ann_id, "image_id": img_id,
                        "category_id": int(vals[5]),
                        "bbox": vals[:4],
                        "area": vals[2] * vals[3],
                        "iscrowd": 0,
                        "score": vals[4],
                    })
                    ann_id += 1
    coco = {"images": images, "annotations": annotations,
            "categories": categories}
    with open(out_path, "w") as f:
        json.dump(coco, f)
    return out_path


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------

def _to_np(t):
    try:
        import torch
        if isinstance(t, torch.Tensor):
            return t.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_linear_to_flax(w: np.ndarray) -> np.ndarray:
    """torch (out, in) -> flax (in, out)."""
    return np.transpose(w, (1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state dict to numpy, handling the reference's
    'model'-wrapped dicts and 'module.' prefixes (backbones/load.py)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _to_np(v)
    return out


def convert_resnet_params(state_dict: Dict[str, np.ndarray],
                          layers: Tuple[int, ...] = (3, 4, 6, 3)):
    """Map a torchvision-style ResNet state dict onto our ResNet module's
    param/batch_stats trees. Returns (params, batch_stats, report)."""
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def put_conv(flax_name, torch_name):
        if torch_name + ".weight" not in state_dict:
            return False
        params[flax_name] = {
            "kernel": torch_conv_to_flax(state_dict[torch_name + ".weight"])}
        used.add(torch_name + ".weight")
        return True

    def put_bn(flax_name, torch_name):
        if torch_name + ".weight" not in state_dict:
            return False
        params[flax_name] = {
            "BatchNorm_0": {
                "scale": state_dict[torch_name + ".weight"],
                "bias": state_dict[torch_name + ".bias"],
            }}
        stats[flax_name] = {
            "BatchNorm_0": {
                "mean": state_dict[torch_name + ".running_mean"],
                "var": state_dict[torch_name + ".running_var"],
            }}
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            used.add(torch_name + suf)
        return True

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            base = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_{b}"
            sub_p, sub_s = {}, {}
            for ci in (1, 2, 3):
                if f"{base}.conv{ci}.weight" in state_dict:
                    sub_p[f"conv{ci}"] = {"kernel": torch_conv_to_flax(
                        state_dict[f"{base}.conv{ci}.weight"])}
                    used.add(f"{base}.conv{ci}.weight")
                bn = f"{base}.bn{ci}"
                if bn + ".weight" in state_dict:
                    sub_p[f"bn{ci}"] = {"BatchNorm_0": {
                        "scale": state_dict[bn + ".weight"],
                        "bias": state_dict[bn + ".bias"]}}
                    sub_s[f"bn{ci}"] = {"BatchNorm_0": {
                        "mean": state_dict[bn + ".running_mean"],
                        "var": state_dict[bn + ".running_var"]}}
                    for suf in (".weight", ".bias", ".running_mean",
                                ".running_var"):
                        used.add(bn + suf)
            ds = f"{base}.downsample"
            if ds + ".0.weight" in state_dict:
                sub_p["downsample_conv"] = {"kernel": torch_conv_to_flax(
                    state_dict[ds + ".0.weight"])}
                sub_p["downsample_bn"] = {"BatchNorm_0": {
                    "scale": state_dict[ds + ".1.weight"],
                    "bias": state_dict[ds + ".1.bias"]}}
                sub_s["downsample_bn"] = {"BatchNorm_0": {
                    "mean": state_dict[ds + ".1.running_mean"],
                    "var": state_dict[ds + ".1.running_var"]}}
                for suf in (".0.weight", ".1.weight", ".1.bias",
                            ".1.running_mean", ".1.running_var"):
                    used.add(ds + suf)
            params[name] = sub_p
            stats[name] = sub_s

    unexpected = sorted(k for k in state_dict
                        if k not in used and "fc." not in k
                        and "num_batches_tracked" not in k)
    report = {"unexpected": unexpected}
    return params, stats, report


def convert_hourglass_params(state_dict: Dict[str, np.ndarray],
                             num_stacks: int = 2, depth: int = 5):
    """Map the reference stacked-hourglass state dict
    (backbones/hourglass.py — pre_layer / hgs.N recursive up1-low1-low2-
    low3 / convs.N / inter_.N / conv_.N / residual.N) onto our
    HourglassNet param/batch_stats trees. Returns (params, stats,
    report)."""
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def conv(torch_name):
        used.add(torch_name + ".weight")
        out = {"kernel": torch_conv_to_flax(state_dict[torch_name + ".weight"])}
        if torch_name + ".bias" in state_dict:
            used.add(torch_name + ".bias")
            out["bias"] = state_dict[torch_name + ".bias"]
        return out

    def bn(torch_name):
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            used.add(torch_name + suf)
        p = {"BatchNorm_0": {"scale": state_dict[torch_name + ".weight"],
                             "bias": state_dict[torch_name + ".bias"]}}
        s = {"BatchNorm_0": {"mean": state_dict[torch_name + ".running_mean"],
                             "var": state_dict[torch_name + ".running_var"]}}
        return p, s

    def residual(torch_base, p_out, s_out, flax_name):
        sub_p, sub_s = {}, {}
        for ci in (1, 2):
            sub_p[f"conv{ci}"] = conv(f"{torch_base}.conv{ci}")
            bp, bs = bn(f"{torch_base}.bn{ci}")
            sub_p[f"bn{ci}"] = bp
            sub_s[f"bn{ci}"] = bs
        if f"{torch_base}.skip_connection.0.weight" in state_dict:
            sub_p["skip_conv"] = conv(f"{torch_base}.skip_connection.0")
            bp, bs = bn(f"{torch_base}.skip_connection.1")
            sub_p["skip_bn"] = bp
            sub_s["skip_bn"] = bs
        p_out[flax_name] = sub_p
        s_out[flax_name] = sub_s

    def seq_len(prefix):
        n = 0
        while f"{prefix}.{n}.conv1.weight" in state_dict:
            n += 1
        return n

    def hourglass(torch_base, p_out, s_out, level):
        for branch in ("up1", "low1", "low3"):
            for j in range(seq_len(f"{torch_base}.{branch}")):
                residual(f"{torch_base}.{branch}.{j}", p_out, s_out,
                         f"{branch}_{j}")
        if level > 1:
            sub_p, sub_s = {}, {}
            hourglass(f"{torch_base}.low2", sub_p, sub_s, level - 1)
            p_out["low2"] = sub_p
            s_out["low2"] = sub_s
        else:
            for j in range(seq_len(f"{torch_base}.low2")):
                residual(f"{torch_base}.low2.{j}", p_out, s_out, f"low2_{j}")

    # stem
    params["pre_conv"] = conv("pre_layer.0")
    bp, bs = bn("pre_layer.1")
    params["pre_bn"] = bp
    stats["pre_bn"] = bs
    residual("pre_layer.3", params, stats, "pre_res")

    for i in range(num_stacks):
        sub_p, sub_s = {}, {}
        hourglass(f"hgs.{i}", sub_p, sub_s, depth)
        params[f"hg{i}"] = sub_p
        stats[f"hg{i}"] = sub_s
        # stack output ConvBN (torch ConvBNRelu: .conv/.bn)
        oc_p = {"conv": conv(f"convs.{i}.conv")}
        bp, bs = bn(f"convs.{i}.bn")
        oc_p["bn"] = bp
        params[f"out_conv{i}"] = oc_p
        stats[f"out_conv{i}"] = {"bn": bs}
        if i < num_stacks - 1:
            ip = {"conv": conv(f"inter_.{i}.0")}
            bp, bs = bn(f"inter_.{i}.1")
            ip["bn"] = bp
            params[f"inter{i}"] = ip
            stats[f"inter{i}"] = {"bn": bs}
            fp = {"conv": conv(f"conv_.{i}.0")}
            bp, bs = bn(f"conv_.{i}.1")
            fp["bn"] = bp
            params[f"fuse{i}"] = fp
            stats[f"fuse{i}"] = {"bn": bs}
            residual(f"residual.{i}", params, stats, f"inter_res{i}")

    unexpected = sorted(k for k in state_dict if k not in used
                        and "num_batches_tracked" not in k)
    return params, stats, {"unexpected": unexpected}


def convert_hrnet_params(state_dict: Dict[str, np.ndarray],
                         stage_modules: Tuple[int, int, int] = (1, 4, 3)):
    """Map an HRNet state dict onto our _HRNetBase param/batch_stats
    trees. One mapping covers both reference variants — the pose-style
    HRNet-w48/w32 (backbones/hrnet.py:148-266, loads
    pose_hrnet_w48_384x288.pth) and HRNetV2-w40 (backbones/hrnetv2.py:
    322-541, loads hrnetv2_w40_imagenet_pretrained.pth) — because both
    share the conv1/bn1..layer1/transition{n}/stage{n}.{m}.branches/
    fuse_layers key scheme. Returns (params, stats, report)."""
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def conv(torch_name):
        used.add(torch_name + ".weight")
        out = {"kernel": torch_conv_to_flax(state_dict[torch_name + ".weight"])}
        if torch_name + ".bias" in state_dict:
            used.add(torch_name + ".bias")
            out["bias"] = state_dict[torch_name + ".bias"]
        return out

    def bn(torch_name):
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            used.add(torch_name + suf)
        p = {"BatchNorm_0": {"scale": state_dict[torch_name + ".weight"],
                             "bias": state_dict[torch_name + ".bias"]}}
        s = {"BatchNorm_0": {"mean": state_dict[torch_name + ".running_mean"],
                             "var": state_dict[torch_name + ".running_var"]}}
        return p, s

    def conv_bn(flax_name, conv_name, bn_name):
        """_ConvBNRelu submodule: {conv, bn}."""
        p = {"conv": conv(conv_name)}
        bp, bs = bn(bn_name)
        p["bn"] = bp
        params[flax_name] = p
        stats[flax_name] = {"bn": bs}

    # Stem.
    conv_bn("stem1", "conv1", "bn1")
    conv_bn("stem2", "conv2", "bn2")

    # Stage 1: 4 bottlenecks (+ downsample on block 0).
    for b in range(4):
        base = f"layer1.{b}"
        sub_p, sub_s = {}, {}
        for ci in (1, 2, 3):
            sub_p[f"conv{ci}"] = conv(f"{base}.conv{ci}")
            bp, bs = bn(f"{base}.bn{ci}")
            sub_p[f"bn{ci}"] = bp
            sub_s[f"bn{ci}"] = bs
        if f"{base}.downsample.0.weight" in state_dict:
            sub_p["downsample_conv"] = conv(f"{base}.downsample.0")
            bp, bs = bn(f"{base}.downsample.1")
            sub_p["downsample_bn"] = bp
            sub_s["downsample_bn"] = bs
        params[f"layer1_{b}"] = sub_p
        stats[f"layer1_{b}"] = sub_s

    # Transitions. transition{n}.{i} is Sequential(conv, bn, relu) when
    # reshaping an existing branch, and Sequential(Sequential(conv, bn,
    # relu)) when creating a new (downsampled) branch.
    conv_bn("trans1_0", "transition1.0.0", "transition1.0.1")
    conv_bn("trans1_1", "transition1.1.0.0", "transition1.1.0.1")
    conv_bn("trans2_2", "transition2.2.0.0", "transition2.2.0.1")
    conv_bn("trans3_3", "transition3.3.0.0", "transition3.3.0.1")

    # Exchange stages.
    for s_idx, n_modules in enumerate(stage_modules):
        stage = s_idx + 2                      # stage2 / stage3 / stage4
        n_branches = stage
        for m in range(n_modules):
            tbase = f"stage{stage}.{m}"
            sub_p, sub_s = {}, {}

            def sconv_bn(flax_name, conv_name, bn_name):
                p = {"conv": conv(conv_name)}
                bp, bs = bn(bn_name)
                p["bn"] = bp
                sub_p[flax_name] = p
                sub_s[flax_name] = {"bn": bs}

            for j in range(n_branches):
                for b in range(4):
                    bb = f"{tbase}.branches.{j}.{b}"
                    bp_, bs_ = {}, {}
                    for ci in (1, 2):
                        bp_[f"conv{ci}"] = conv(f"{bb}.conv{ci}")
                        p2, s2 = bn(f"{bb}.bn{ci}")
                        bp_[f"bn{ci}"] = p2
                        bs_[f"bn{ci}"] = s2
                    sub_p[f"branch{j}_block{b}"] = bp_
                    sub_s[f"branch{j}_block{b}"] = bs_
            for i in range(n_branches):
                for j in range(n_branches):
                    fl = f"{tbase}.fuse_layers.{i}.{j}"
                    if i < j and fl + ".0.weight" in state_dict:
                        sub_p[f"fuse{i}_{j}_conv"] = conv(fl + ".0")
                        bp, bs = bn(fl + ".1")
                        sub_p[f"fuse{i}_{j}_bn"] = bp
                        sub_s[f"fuse{i}_{j}_bn"] = bs
                    elif i > j:
                        for k in range(i - j):
                            if f"{fl}.{k}.0.weight" not in state_dict:
                                break
                            sconv_bn(f"fuse{i}_{j}_down{k}",
                                     f"{fl}.{k}.0", f"{fl}.{k}.1")
            params[f"stage{stage}_{m}"] = sub_p
            stats[f"stage{stage}_{m}"] = sub_s

    unexpected = sorted(
        k for k in state_dict if k not in used
        and "num_batches_tracked" not in k
        and not k.startswith("final_layer."))   # pose head, unused
    return params, stats, {"unexpected": unexpected}


def convert_shufflenet_params(state_dict: Dict[str, np.ndarray],
                              stage_repeats: Tuple[int, ...] = (4, 8, 4)):
    """Map the reference ShuffleNetV2 state dict (backbones/
    shufflenet.py:113-172: conv1 / flat features.{idx} InvertedResidual
    units with banch1/banch2 Sequentials / conv_last) onto our
    ShuffleNetV2 trees. Returns (params, stats, report)."""
    params: Dict = {}
    stats: Dict = {}
    used = set()

    def conv(torch_name):
        used.add(torch_name + ".weight")
        w = state_dict[torch_name + ".weight"]
        if w.shape[1] == 1 and w.shape[0] > 1:
            # torch depthwise (C, 1, kh, kw) -> flax
            # feature_group_count=C kernels (kh, kw, 1, C)
            k = np.transpose(w, (2, 3, 1, 0))
        else:
            k = torch_conv_to_flax(w)
        out = {"kernel": k}
        if torch_name + ".bias" in state_dict:
            used.add(torch_name + ".bias")
            out["bias"] = state_dict[torch_name + ".bias"]
        return out

    def bn(torch_name):
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            used.add(torch_name + suf)
        p = {"BatchNorm_0": {"scale": state_dict[torch_name + ".weight"],
                             "bias": state_dict[torch_name + ".bias"]}}
        s = {"BatchNorm_0": {"mean": state_dict[torch_name + ".running_mean"],
                             "var": state_dict[torch_name + ".running_var"]}}
        return p, s

    def conv_bn(flax_name, conv_name, bn_name, p_out, s_out):
        p = {"conv": conv(conv_name)}
        bp, bs = bn(bn_name)
        p["bn"] = bp
        p_out[flax_name] = p
        s_out[flax_name] = {"bn": bs}

    conv_bn("conv1", "conv1.0", "conv1.1", params, stats)

    idx = 0
    for stage, repeats in enumerate(stage_repeats):
        for i in range(repeats):
            base = f"features.{idx}"
            idx += 1
            sub_p, sub_s = {}, {}
            if i == 0:   # stride-2 unit: banch1 = [dw, bn, pwl, bn, relu]
                conv_bn("b1_dw", f"{base}.banch1.0", f"{base}.banch1.1",
                        sub_p, sub_s)
                conv_bn("b1_pwl", f"{base}.banch1.2", f"{base}.banch1.3",
                        sub_p, sub_s)
            # banch2 = [pw, bn, relu, dw, bn, pwl, bn, relu]
            conv_bn("b2_pw", f"{base}.banch2.0", f"{base}.banch2.1",
                    sub_p, sub_s)
            conv_bn("b2_dw", f"{base}.banch2.3", f"{base}.banch2.4",
                    sub_p, sub_s)
            conv_bn("b2_pwl", f"{base}.banch2.5", f"{base}.banch2.6",
                    sub_p, sub_s)
            params[f"stage{stage}_{i}"] = sub_p
            stats[f"stage{stage}_{i}"] = sub_s

    conv_bn("conv_last", "conv_last.0", "conv_last.1", params, stats)

    unexpected = sorted(
        k for k in state_dict if k not in used
        and "num_batches_tracked" not in k
        and not k.startswith("classifier."))   # imagenet head, unused
    return params, stats, {"unexpected": unexpected}


def convert_detector_params(state_dict: Dict[str, np.ndarray],
                            model: str = "centernet",
                            num_stacks: int = 2, depth: int = 5):
    """Full-model converter for reference CenterNet/RRNet checkpoints
    (models/centernet.py / models/rrnet.py + detectors/*): hourglass
    backbone + per-stack heads (+ RRNet's stage-2 FasterRCNNDetector).
    Returns (params, stats, report)."""
    bb_sd = {k[len("backbone."):]: v for k, v in state_dict.items()
             if k.startswith("backbone.")}
    params, stats, report = convert_hourglass_params(bb_sd, num_stacks, depth)
    params = {"backbone": params}
    stats = {"backbone": stats}
    used = {"backbone." + k for k in bb_sd}

    def conv(torch_name):
        used.add(torch_name + ".weight")
        out = {"kernel": torch_conv_to_flax(state_dict[torch_name + ".weight"])}
        if torch_name + ".bias" in state_dict:
            used.add(torch_name + ".bias")
            out["bias"] = state_dict[torch_name + ".bias"]
        return out

    def bn(torch_name):
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            used.add(torch_name + suf)
        p = {"BatchNorm_0": {"scale": state_dict[torch_name + ".weight"],
                             "bias": state_dict[torch_name + ".bias"]}}
        s = {"BatchNorm_0": {"mean": state_dict[torch_name + ".running_mean"],
                             "var": state_dict[torch_name + ".running_var"]}}
        return p, s

    # CenterNetDetector heads: detect_layer.{i}.0.conv (BasicCov 3x3) +
    # detect_layer.{i}.1 (1x1 out). Ours: conv{i} / out{i}.
    def plain_head(torch_prefix):
        p = {}
        for i in range(num_stacks):
            p[f"conv{i}"] = conv(f"{torch_prefix}.detect_layer.{i}.0.conv")
            p[f"out{i}"] = conv(f"{torch_prefix}.detect_layer.{i}.1")
        return p

    # CenterNetWHDetector: detect_conv_layer.{i}.0.conv +
    # detect_H_layer.{i}.0.conv (kx1) + detect_W_layer.{i}.0.conv (1xk)
    def wh_head():
        p = {}
        for i in range(num_stacks):
            p[f"conv{i}"] = conv(f"wh.detect_conv_layer.{i}.0.conv")
            p[f"hconv{i}"] = conv(f"wh.detect_H_layer.{i}.0.conv")
            p[f"wconv{i}"] = conv(f"wh.detect_W_layer.{i}.0.conv")
        return p

    params["hm"] = plain_head("hm")
    params["wh"] = wh_head()
    reg_name = "offset_reg" if model == "rrnet" else "reg"
    our_reg = "offset" if model == "rrnet" else "reg"
    params[our_reg] = plain_head(reg_name)

    if model == "rrnet":
        # FasterRCNNDetector: top_layer (Bottleneck 256->64x4) + regressor
        hp, hs = {}, {}
        sub_p, sub_s = {}, {}
        for ci in (1, 2, 3):
            sub_p[f"conv{ci}"] = conv(f"head_detector.top_layer.conv{ci}")
            bp, bss = bn(f"head_detector.top_layer.bn{ci}")
            sub_p[f"bn{ci}"] = bp
            sub_s[f"bn{ci}"] = bss
        hp["top"] = sub_p
        hs["top"] = sub_s
        w = state_dict["head_detector.regressor.weight"]   # (4, 256, 1, 1)
        used.add("head_detector.regressor.weight")
        used.add("head_detector.regressor.bias")
        hp["regressor"] = {
            "kernel": torch_linear_to_flax(w.reshape(w.shape[0], w.shape[1])),
            "bias": state_dict["head_detector.regressor.bias"],
        }
        params["head_detector"] = hp
        stats["head_detector"] = hs

    unexpected = sorted(k for k in state_dict if k not in used
                        and "num_batches_tracked" not in k)
    return params, stats, {"unexpected": unexpected}


def merge_pretrained(variables, pretrained_params, pretrained_stats,
                     scope: str = "backbone"):
    """Graft converted pretrained subtrees into an initialized variables
    tree (strict=False: only matching leaf shapes are replaced)."""
    import jax

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = merge(out[k], v)
            elif k in out and hasattr(out[k], "shape") and \
                    np.shape(v) == np.shape(out[k]):
                out[k] = np.asarray(v, np.float32)
        return out

    variables = dict(variables)
    params = dict(variables["params"])
    if scope in params:
        params[scope] = merge(params[scope], pretrained_params)
    else:
        params = merge(params, pretrained_params)
    variables["params"] = params
    if pretrained_stats and "batch_stats" in variables:
        bs = dict(variables["batch_stats"])
        if scope in bs:
            bs[scope] = merge(bs[scope], pretrained_stats)
        else:
            bs = merge(bs, pretrained_stats)
        variables["batch_stats"] = bs
    return variables
