"""Kernel-tensor vs kernel-function contour comparison
(reference test_kernel_tensor_approximation.jl)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import common  # noqa: F401  (honors JAX_PLATFORMS before jax initializes)
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from cloudy_tpu import kernels as K

outdir = os.path.join(os.path.dirname(__file__), "output")
os.makedirs(outdir, exist_ok=True)

kf = K.LongKernelFunction(5.236e-10, 9.44e9, 5.78)
below = K.CoalescenceTensor.from_function(kf, 2, 5e-10)
above = K.CoalescenceTensor.from_function(kf, 2, 1e-6, 5e-10)

fig, axes = plt.subplots(1, 3, figsize=(12, 3.4))
x = np.logspace(-11, -6, 80)
X, Y = np.meshgrid(x, x)
exact = np.asarray(kf(X, Y))
approx = np.where((X < 5.236e-10) & (Y < 5.236e-10), np.asarray(below(X, Y)), np.asarray(above(X, Y)))
for ax, z, title in zip(axes, [exact, approx, np.abs(approx - exact) / (exact + 1e-300)],
                        ["K(x,y) exact", "tensor approx", "relative error"]):
    c = ax.pcolormesh(X, Y, np.log10(np.maximum(z, 1e-300)), shading="auto")
    ax.set_xscale("log"); ax.set_yscale("log"); ax.set_title(title)
    fig.colorbar(c, ax=ax)
fig.tight_layout(); fig.savefig(f"{outdir}/kernel_tensor_approximation.png", dpi=110)
print("max rel error in fit windows:",
      np.max(np.abs(approx - exact) / (exact + 1e-300)))
