#!/usr/bin/env python
"""Convert the `lpips` pip package's AlexNet LPIPS weights to the .npz
format consumed by qdm_tpu.evaluation.lpips (run once on a machine with
torchvision/lpips installed; this zero-egress image cannot download the
weights itself).

The key mapping (``extract_state``) is pinned by
tests/test_lpips_golden.py::test_convert_lpips_key_mapping against a
synthetic torch-format LPIPS module, so the converter's correctness
does not wait for the day real weights land.

Usage:
    python tools/convert_lpips.py --out qdm_tpu/evaluation/lpips_alex.npz
"""

import argparse

import numpy as np


def extract_state(model) -> dict:
    """lpips.LPIPS(net='alex')-shaped module -> the npz dict
    qdm_tpu.evaluation.lpips.load_lpips_weights consumes.

    Layout contract (lpips 0.1.x): ``model.net.slice1..slice5`` are
    Sequential chunks of torchvision AlexNet features containing the 5
    Conv2d taps in order; ``model.lin0..lin4`` are NetLinLayer whose
    ``.model[1]`` is the 1x1 Conv2d head.  torch conv weights are OIHW;
    the JAX port's are HWIO (evaluation/lpips.py::_conv)."""
    import torch

    convs = []
    for name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        convs += [m for m in getattr(model.net, name)
                  if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, len(convs)
    state = {}
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO
        state[f"conv{i}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        state[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i in range(5):
        lin = getattr(model, f"lin{i}")
        w = lin.model[1].weight.detach().numpy()   # (1, C, 1, 1)
        state[f"lin{i}_w"] = w.reshape(-1)
    return state


def main(out_path: str):
    import lpips as lpips_pkg  # needs pip install lpips (pulls torchvision)

    model = lpips_pkg.LPIPS(net="alex")
    state = extract_state(model)
    np.savez(out_path, **state)
    print(f"wrote {out_path} ({len(state)} arrays)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="qdm_tpu/evaluation/lpips_alex.npz")
    main(ap.parse_args().out)
