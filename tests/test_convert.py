"""torch->flax weight converter tests (no torchvision in this image):
  * functional parity of the conv/linear weight transposes,
  * structural completeness of the ResNet state-dict mapping against a
    synthetic torchvision-shaped state dict.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from rrnet_tpu.models.backbones.resnet import resnet50
from rrnet_tpu.utils import convert


def test_conv_weight_transpose_parity():
    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)      # OIHW
    x = rng.randn(1, 3, 16, 16).astype(np.float32)    # NCHW
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()

    conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(
        convert.torch_conv_to_flax(w))}}
    out = conv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4)


def test_linear_weight_transpose_parity():
    rng = np.random.RandomState(1)
    w = rng.randn(5, 7).astype(np.float32)
    x = rng.randn(3, 7).astype(np.float32)
    ref = x @ w.T
    dense = nn.Dense(5, use_bias=False)
    out = dense.apply(
        {"params": {"kernel": jnp.asarray(convert.torch_linear_to_flax(w))}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def _synthetic_resnet50_sd():
    """State dict with torchvision resnet50 keys/shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = np.abs(rng.randn(c)).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5
        sd[name + ".num_batches_tracked"] = np.asarray(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage, blocks in enumerate((3, 4, 6, 3)):
        planes = 64 * (2 ** stage)
        for b in range(blocks):
            base = f"layer{stage + 1}.{b}"
            conv(base + ".conv1", planes, inplanes, 1)
            bn(base + ".bn1", planes)
            conv(base + ".conv2", planes, planes, 3)
            bn(base + ".bn2", planes)
            conv(base + ".conv3", planes * 4, planes, 1)
            bn(base + ".bn3", planes * 4)
            if b == 0:
                conv(base + ".downsample.0", planes * 4, inplanes, 1)
                bn(base + ".downsample.1", planes * 4)
            inplanes = planes * 4
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def test_resnet50_mapping_complete():
    sd = _synthetic_resnet50_sd()
    params, stats, report = convert.convert_resnet_params(sd, (3, 4, 6, 3))
    assert report["unexpected"] == []

    bb = resnet50()
    variables = bb.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), train=False)

    # every leaf in the converted tree must match an init leaf's shape
    def check(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in init tree"
            if isinstance(v, dict):
                check(dst[k], v, path + "/" + k)
            else:
                assert np.shape(v) == np.shape(dst[k]), (
                    path + "/" + k, np.shape(v), np.shape(dst[k]))

    check(variables["params"], params)
    check(variables["batch_stats"], stats)

    # and the converted params must cover the FULL init tree
    n_init = len(jax.tree.leaves(variables["params"]))
    n_conv = len(jax.tree.leaves(params))
    assert n_conv == n_init, (n_conv, n_init)


def test_load_torch_state_dict_unwraps(tmp_path):
    sd = {"module.conv1.weight": torch.zeros(2, 3, 1, 1)}
    p = str(tmp_path / "m.pth")
    torch.save({"model": sd}, p)
    out = convert.load_torch_state_dict(p)
    assert list(out) == ["conv1.weight"]
    assert out["conv1.weight"].shape == (2, 3, 1, 1)


def test_visdrone_to_coco_demo_fixture(tmp_path):
    """Golden-JSON check of the VisDrone->COCO converter on the demo
    fixture, against the reference Convertor's semantics
    (utils/data_type_convertor.py:7-153): all 12 categories present in
    VisDrone id order, image sizes from the file, one annotation per
    8-column txt row with category_id=cls, bbox=[x,y,w,h], area=w*h,
    iscrowd=0."""
    import json
    import os
    import shutil

    from rrnet_tpu.utils.convert import visdrone_to_coco

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    demo = os.path.join(repo, "data", "demo")
    name = "0000364_01765_d_0000782"
    split = tmp_path / "train"
    (split / "images").mkdir(parents=True)
    (split / "annotations").mkdir()
    shutil.copy(os.path.join(demo, "images", name + ".jpg"),
                split / "images" / (name + ".jpg"))
    shutil.copy(os.path.join(demo, "annotations", name + ".txt"),
                split / "annotations" / (name + ".txt"))

    out = visdrone_to_coco(str(tmp_path), "train",
                           str(tmp_path / "train.json"))
    with open(out) as f:
        coco = json.load(f)

    # categories: the reference's 12 VisDrone ids, 0=ignore .. 11=others
    assert [c["id"] for c in coco["categories"]] == list(range(12))
    names = [c["name"] for c in coco["categories"]]
    assert names[1] == "pedestrian" and names[4] == "car"
    assert names[11] == "others"

    assert len(coco["images"]) == 1
    img = coco["images"][0]
    assert img["file_name"] == name + ".jpg"
    from PIL import Image
    with Image.open(split / "images" / (name + ".jpg")) as im:
        assert (img["width"], img["height"]) == im.size

    # every 8-col txt row becomes one annotation with the reference's
    # field semantics
    rows = []
    with open(split / "annotations" / (name + ".txt")) as f:
        for line in f:
            line = line.strip().strip(",")
            if line:
                rows.append([int(float(v)) for v in line.split(",")[:8]])
    assert len(coco["annotations"]) == len(rows) > 0
    for ann, row in zip(coco["annotations"], rows):
        x, y, w, h, score, cls = row[:6]
        assert ann["image_id"] == coco["images"][0]["id"]
        assert ann["category_id"] == cls
        assert [int(v) for v in ann["bbox"]] == [x, y, w, h]
        assert int(ann["area"]) == w * h
        assert ann["iscrowd"] == 0
    # annotation ids are unique and dense
    ids = [a["id"] for a in coco["annotations"]]
    assert len(set(ids)) == len(ids)
