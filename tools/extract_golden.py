"""Extract published golden-value tables from the reference test fixtures.

These are benchmark *data* (6SV1 radiative-transfer code outputs and the
Natraj et al. (2009) tabulated Rayleigh Stokes vectors), transcribed into
framework-native fixtures (JSON / NPZ) for our accuracy gates.

Run once:  python tools/extract_golden.py
"""
import ast
import json
import os
import re

import numpy as np

REF = "/root/reference/test/benchmarks"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def extract_6sv1():
    src = open(f"{REF}/6SV1_R_trues.jl").read()
    src = re.sub(r"#.*", "", src)
    src = src.split("=", 1)[1].strip().rstrip(";")
    data = ast.literal_eval(src)
    arr = np.asarray(data)          # (6 cases, 3 sza, 3 az, 16 vza)
    assert arr.shape == (6, 3, 3, 16), arr.shape
    with open(f"{OUT}/6sv1_r_trues.json", "w") as f:
        json.dump(arr.tolist(), f)
    print("6SV1:", arr.shape)


def extract_natraj():
    src = open(f"{REF}/natraj_trues.jl").read()
    out = {}
    for name in ("I_trues", "Q_trues", "U_trues"):
        m = re.search(name + r"\s*=\s*\n?\[(.*?)\]", src, re.S)
        rows = [r.strip() for r in m.group(1).split(";") if r.strip()]
        mat = np.array([[float(x) for x in row.split()] for row in rows])
        assert mat.shape == (16, 7), (name, mat.shape)
        out[name] = mat
    np.savez(f"{OUT}/natraj_trues.npz", **out)
    print("natraj:", {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    extract_6sv1()
    extract_natraj()
