"""Example: load an artifact and classify images — the analogue of the
reference's CIFAR-10/MNIST notebooks (SURVEY.md C17).

    python examples/classify.py artifacts/cnv-w1a1.npz

Uses random images if no .npy file is given; prints class names and
usecPerImage exactly as the reference notebooks did.
"""

import sys

import numpy as np

from bnn_pynq_tpu.runtime.classifier import Classifier


def main():
    artifact = sys.argv[1] if len(sys.argv) > 1 else "artifacts/cnv-w1a1.npz"
    clf = Classifier.from_artifact(artifact)
    cfg = clf.config
    if len(sys.argv) > 2:
        imgs = np.load(sys.argv[2])
    else:
        imgs = np.random.default_rng(0).integers(
            0, 256, size=(8,) + cfg.input_shape).astype(np.uint8)
    preds = clf.classify_images(imgs)
    for i, p in enumerate(preds):
        print(f"image {i}: class {int(p)} ({clf.class_name(p)})")
    print(f"usecPerImage: {clf.usecPerImage:.1f}")


if __name__ == "__main__":
    main()
