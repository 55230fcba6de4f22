"""Export LPIPS-VGG weights to the .npz format gscream_tpu loads.

Run on any machine with network access + the upstream packages:

    pip install lpips torch torchvision
    python tools/export_lpips.py ~/.cache/gscream/lpips_vgg.npz

Keys: conv{i}_w (OIHW f32), conv{i}_b for the 13 VGG16 convs, and
lin{j}_w (C_j,) for the 5 LPIPS linear heads.
"""
import sys

import numpy as np


def main(out_path):
    import lpips  # noqa: requires network-installed package
    import torch

    net = lpips.LPIPS(net="vgg", spatial=False)
    vgg = net.net  # lpips.pretrained_networks.vgg16
    convs = []
    for stage in [vgg.slice1, vgg.slice2, vgg.slice3, vgg.slice4,
                  vgg.slice5]:
        for layer in stage:
            if isinstance(layer, torch.nn.Conv2d):
                convs.append((layer.weight.detach().numpy(),
                              layer.bias.detach().numpy()))
    assert len(convs) == 13, len(convs)
    lins = [lin.model[1].weight.detach().numpy().reshape(-1)
            for lin in net.lins]
    out = {}
    for i, (w, b) in enumerate(convs):
        out[f"conv{i}_w"] = w.astype(np.float32)
        out[f"conv{i}_b"] = b.astype(np.float32)
    for j, lw in enumerate(lins):
        out[f"lin{j}_w"] = lw.astype(np.float32)
    np.savez(out_path, **out)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
