"""Native C++ resampler vs scipy on preprocessing-sized volumes."""
import sys
import time

import numpy as np
from scipy import ndimage

sys.path.insert(0, "/root/repo")
from nextou_tpu import native  # noqa: E402


def t(f, n=1):
    f()
    t0 = time.perf_counter()
    for _ in range(n):
        f()
    return (time.perf_counter() - t0) / n


def main():
    if not native.available():
        print("native library unavailable")
        return
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 256, 256)).astype(np.float32)
    out_shape = (180, 320, 320)
    f = [a / b for a, b in zip(out_shape, x.shape)]
    ts = t(lambda: ndimage.zoom(x, f, order=3))
    tn = t(lambda: native.zoom_to_shape(x, out_shape, 3))
    print(f"zoom order-3 (128^3x2 -> 180x320x320): scipy {ts:.2f}s "
          f"native {tn:.2f}s ({ts/tn:.1f}x)")

    mat = np.eye(3) * 1.02
    center = (np.array(x.shape) - 1) / 2.0
    off = center - mat @ center
    ts = t(lambda: ndimage.affine_transform(x, mat, offset=off, order=1, mode="reflect"))
    tn = t(lambda: native.affine_transform(x, mat, off, 1, "reflect"))
    print(f"affine order-1: scipy {ts:.2f}s native {tn:.2f}s ({ts/tn:.1f}x)")

    ts = t(lambda: ndimage.gaussian_filter(x, 1.0))
    tn = t(lambda: native.gaussian_filter(x, 1.0))
    print(f"gaussian s=1.0: scipy {ts:.2f}s native {tn:.2f}s ({ts/tn:.1f}x)")


if __name__ == "__main__":
    main()