"""End-to-end weight-conversion numeric parity: a randomly-initialized torch
ResNet-50 (built inline — torchvision is absent) converted through the
(torch -> d2 names -> flax variables) chain must produce the same features
as the torch forward. Validates the converter + ResNet numerics (stride
placement, padding, BN folding, maxpool semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _build_torch_resnet50(torch):
    nn = torch.nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, cmid, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cmid, 1, stride=stride, bias=False)
            self.bn1 = nn.BatchNorm2d(cmid)
            self.conv2 = nn.Conv2d(cmid, cmid, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(cmid)
            self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            if cin != cout or stride != 1:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(cout),
                )
            else:
                self.downsample = None
            self.relu = nn.ReLU()

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            sc = x if self.downsample is None else self.downsample(x)
            return self.relu(out + sc)

    class R50(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

            def stage(cin, cmid, cout, blocks, stride):
                layers = [Bottleneck(cin, cmid, cout, stride)]
                for _ in range(blocks - 1):
                    layers.append(Bottleneck(cout, cmid, cout, 1))
                return nn.Sequential(*layers)

            self.layer1 = stage(64, 64, 256, 3, 1)
            self.layer2 = stage(256, 128, 512, 4, 2)
            self.layer3 = stage(512, 256, 1024, 6, 2)
            self.layer4 = stage(1024, 512, 2048, 3, 2)

    return R50()


def test_torch_resnet_feature_parity():
    torch = pytest.importorskip("torch")

    from jtsm_tpu.checkpoint import convert_d2_state_dict_to_variables
    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.modeling import build_backbone

    torch.manual_seed(0)
    tv = _build_torch_resnet50(torch)
    # randomize BN stats so FrozenBN folding is actually exercised
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    tv.eval()

    sd = {}
    for k, v in tv.state_dict().items():
        if "num_batches" in k:
            continue
        nk = k
        if "layer" not in nk:
            nk = "stem." + nk
        for t in [1, 2, 3, 4]:
            nk = nk.replace(f"layer{t}", f"res{t + 1}")
        for t in [1, 2, 3]:
            nk = nk.replace(f"bn{t}", f"conv{t}.norm")
        nk = nk.replace("downsample.0", "shortcut")
        nk = nk.replace("downsample.1", "shortcut.norm")
        sd[nk] = v.detach().numpy()

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.STRIDE_IN_1X1 = True  # matches the 1x1-strided torch net above
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    backbone = build_backbone(cfg)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    variables = backbone.init(jax.random.key(0), jnp.asarray(x))
    converted, matched, unmatched = convert_d2_state_dict_to_variables(
        sd, dict(variables)
    )
    assert unmatched == [], unmatched[:10]
    assert len(matched) == len(sd)

    feats = backbone.apply(converted, jnp.asarray(x))

    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        t = tv.maxpool(tv.relu(tv.bn1(tv.conv1(t))))
        taps = {}
        t = tv.layer1(t); taps["res2"] = t
        t = tv.layer2(t); taps["res3"] = t
        t = tv.layer3(t); taps["res4"] = t
        t = tv.layer4(t); taps["res5"] = t

    for name in ["res2", "res3", "res4", "res5"]:
        ours = np.asarray(feats[name])
        theirs = taps[name].numpy().transpose(0, 2, 3, 1)
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        denom = np.abs(theirs).max() + 1e-6
        rel = np.abs(ours - theirs).max() / denom
        assert rel < 2e-3, (name, rel)
