#!/usr/bin/env python
"""Convert the `lpips` pip package's AlexNet LPIPS weights to the .npz
format consumed by qdm_tpu.evaluation.lpips (run once on a machine with
torchvision/lpips installed; this zero-egress image cannot download the
weights itself).

Usage:
    python tools/convert_lpips.py --out qdm_tpu/evaluation/lpips_alex.npz
"""

import argparse

import numpy as np


def main(out_path: str):
    import lpips as lpips_pkg  # needs pip install lpips (pulls torchvision)
    import torch

    model = lpips_pkg.LPIPS(net="alex")
    state = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + \
            [m for m in model.net.slice3] + [m for m in model.net.slice4] + \
            [m for m in model.net.slice5]
    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(conv_layers) == 5, len(conv_layers)
    for i, conv in enumerate(conv_layers):
        # torch OIHW -> HWIO
        state[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        state[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate([model.lin0, model.lin1, model.lin2, model.lin3,
                             model.lin4]):
        w = lin.model[1].weight.detach().numpy()   # (1, C, 1, 1)
        state[f"lin{i}_w"] = w.reshape(-1)
    np.savez(out_path, **state)
    print(f"wrote {out_path} ({len(state)} arrays)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="qdm_tpu/evaluation/lpips_alex.npz")
    main(ap.parse_args().out)
