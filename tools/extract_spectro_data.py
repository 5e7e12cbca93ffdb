"""Extract TIPS-2017 partition sums and isotopologue metadata into npz.

These are public scientific constant tables (Gamache et al. 2017 TIPS;
HITRAN isotopologue metadata), read from the reference's bundled NetCDF4
files and stored framework-native.

Run once:  python tools/extract_spectro_data.py
"""
import os

import h5py
import numpy as np

SRC = "/root/reference/src/Absorption/constants"
OUT = os.path.join(os.path.dirname(__file__), "..", "vsmartmom",
                   "spectroscopy", "data")


def main():
    os.makedirs(OUT, exist_ok=True)

    # The HDF5 (C-order) view is the reverse of Julia's column-major
    # [mol, iso, T-idx]; transpose to [mol, iso, T-idx] for storage.
    with h5py.File(f"{SRC}/TIPS_2017.nc") as h:
        tips_t = np.asarray(h["TIPS_2017_T"]).transpose(2, 1, 0)
        tips_q = np.asarray(h["TIPS_2017_Q"]).transpose(2, 1, 0)
    print("tips_t shape [mol, iso, nT]:", tips_t.shape)

    with h5py.File(f"{SRC}/iso_info.nc") as h:
        iso = {k: np.asarray(h[k]).T for k in
               ("molecule", "isotope", "global_id", "abundance",
                "mol_weight")}
        isoname = np.asarray(h["isoname"]).astype(str).T
        mol_name = np.asarray(h["mol_name"]).astype(str).T
    print("weights shape [mol, iso]:", iso["mol_weight"].shape)

    np.savez_compressed(
        f"{OUT}/tips2017.npz", tips_t=tips_t, tips_q=tips_q)
    np.savez_compressed(
        f"{OUT}/iso_info.npz", isoname=isoname, mol_name=mol_name, **iso)
    print("written to", OUT)


if __name__ == "__main__":
    main()
