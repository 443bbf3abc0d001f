"""Adiabatic parcel with condensational growth, three size-distribution
closures, vs Rogers (1975) data (reference parcel_example.jl)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import common  # noqa: F401  (honors JAX_PLATFORMS before jax initializes)
import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from cloudy_tpu.models import parcel as pm

outdir = os.path.join(os.path.dirname(__file__), "output")
os.makedirs(outdir, exist_ok=True)

fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 3.6))
ax1.plot(pm.ROGERS_TIME_SUPERSAT, pm.ROGERS_SUPERSAT, "ko", ms=3, label="Rogers 1975")
ax2.plot(pm.ROGERS_TIME_RADIUS, pm.ROGERS_RADIUS, "ko", ms=3)

for kind in ["monodisperse", "gamma", "mixture"]:
    spec, mom0, ml_v = pm.init_conditions(kind)
    config = pm.ParcelConfig(spec=spec)
    Y0 = pm.initial_state(config, mom0, ml_v)
    ts, ys = pm.run_parcel(config, Y0)
    ts, ys = np.asarray(ts), np.asarray(ys)
    ax1.plot(ts, (ys[:, 0] - 1) * 100, label=kind)
    N_l, M_l = ys[:, 4], ys[:, 5]
    r_um = (M_l / N_l / config.tps.rho_w * 3 / 4 / np.pi) ** (1 / 3) * 1e6
    ax2.plot(ts, r_um)

ax1.set_xlabel("time [s]"); ax1.set_ylabel("supersaturation [%]"); ax1.legend(fontsize=7)
ax2.set_xlabel("time [s]"); ax2.set_ylabel("mean radius [μm]")
fig.tight_layout(); fig.savefig(f"{outdir}/parcel_example.png", dpi=110)
print("parcel example done")
