"""Generate tests/fixtures/wrn28_10_keys.json — the exact pytorchcv
wrn28_10_cifar10/cifar100 state-dict key contract (keys + shapes).

Authored from first principles against pytorchcv's source layout (osmr/
imgclsmob, pytorch/pytorchcv/models/wrn_cifar.py + preresnet.py), which the
reference re-exports as its headline WRN-28-10 backbone
(/root/reference/nbdt/models/wideresnet.py:10-40):

* ``CIFARWRN.features.init_block`` is a bare ``conv3x3`` (plain nn.Conv2d,
  no bias) -> key ``features.init_block.weight``; pre-activation nets close
  with ``features.post_activ`` (PreResActivation: bn + relu).
* Each stage unit is a ``PreResUnit(bottleneck=False)`` whose ``body`` is a
  ``PreResBlock``: ``conv1``/``conv2`` are ``PreConvBlock``s (bn -> relu ->
  conv3x3, conv bias-free), and a resizing unit adds a bare ``conv1x1``
  named ``identity_conv`` applied to the pre-activation.
* WRN-28-10: depth 28 -> (28-4)/6 = 4 units per stage, widths 160/320/640,
  init width 16; resize happens at each stage's unit1 (channel change at
  stage1, channel+stride at stages 2-3).
* Head: ``output`` (nn.Linear, 640 -> num_classes).

The fixture makes topology drift fail loudly: if real pytorchcv ever
disagrees with this enumeration, the released reference checkpoints would
misload — tests/test_models.py asserts the torch transcription AND the
converter's key mapping both match this contract exactly.
"""

import json
import os

BN_SUFFIXES = ("weight", "bias", "running_mean", "running_var",
               "num_batches_tracked")


def wrn28_10_keys(num_classes: int):
    entries = []

    def bn(prefix, c):
        for s in BN_SUFFIXES:
            entries.append((f"{prefix}.{s}", [] if s == "num_batches_tracked"
                            else [c]))

    entries.append(("features.init_block.weight", [16, 3, 3, 3]))
    cin = 16
    for stage, (width, stage_stride) in enumerate(
        zip((160, 320, 640), (1, 2, 2)), start=1
    ):
        for unit in range(1, 5):
            u = f"features.stage{stage}.unit{unit}"
            bn(f"{u}.body.conv1.bn", cin)
            entries.append((f"{u}.body.conv1.conv.weight", [width, cin, 3, 3]))
            bn(f"{u}.body.conv2.bn", width)
            entries.append((f"{u}.body.conv2.conv.weight",
                            [width, width, 3, 3]))
            if cin != width or (unit == 1 and stage_stride != 1):
                entries.append((f"{u}.identity_conv.weight",
                                [width, cin, 1, 1]))
            cin = width
    bn("features.post_activ.bn", 640)
    entries.append(("output.weight", [num_classes, 640]))
    entries.append(("output.bias", [num_classes]))
    return entries


def main():
    out = {
        "wrn28_10_cifar10": wrn28_10_keys(10),
        "wrn28_10_cifar100": wrn28_10_keys(100),
    }
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "wrn28_10_keys.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    n10 = len(out["wrn28_10_cifar10"])
    print(f"wrote {path}: {n10} keys per variant")


if __name__ == "__main__":
    main()
