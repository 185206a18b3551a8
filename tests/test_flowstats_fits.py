"""flowstats_fits.py recovers known constants from a synthetic sweep pickle."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_fits_recover_synthetic_constants(tmp_path):
    rng = np.random.default_rng(0)
    a_true, b_true = 0.22, 0.27
    w_inf, ra_c, n = 0.965, 654.4, 1.07
    records = []
    for ra in [500, 1000, 2000, 8000, 32000, 128000, 1000000]:
        nu = a_true * ra**b_true
        rn = ra**n
        wm = w_inf * rn / (rn + ra_c**n)
        records.append({
            "ra": ra,
            "nusselt": list(nu + 1e-4 * rng.standard_normal(200)),
            "max_u": [0.1] * 200,
            "max_v": [0.1] * 200,
            "max_w": list(wm + 1e-5 * rng.standard_normal(200)),
        })
    pkl = tmp_path / "flowstats_ra.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(records, f)

    out = tmp_path / "fits.json"
    subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "experiments", "flowstats", "flowstats_fits.py"),
         "--pkl", str(pkl), "--out", str(out)],
        check=True, cwd=ROOT,
    )
    fits = json.loads(out.read_text())
    assert abs(fits["nu_power_law"]["a"] - a_true) < 0.02
    assert abs(fits["nu_power_law"]["b"] - b_true) < 0.01
    assert abs(fits["w_max_hill"]["w_inf"] - w_inf) < 0.02
    assert abs(fits["w_max_hill"]["ra_c"] - ra_c) / ra_c < 0.1
