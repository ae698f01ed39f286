"""Extract public spectral *data tables* from the reference sources into .npz.

The reference embeds standard/public measurement data as C arrays:
  - CIE 1931 2-deg color matching functions (471 samples, 360-830nm)
    and the D65 standard illuminant SPD (531 samples, 300-830nm)
    [public CIE data; libSLR/BasicTypes/common_spectra.cpp]
  - ColorChecker 24-patch measured reflectances (X-Rite data)
  - Meng-Simon 2015 "Physically Meaningful Rendering using Tristimulus
    Colours" spectrum-upsampling grid (paper supplementary data):
    12x14 uv grid cells + data points with 95-sample basis spectra
    [libSLR/BasicTypes/Spectrum.h]
  - Measured IOR curves (Ciddor 1996 air, OHARA S-BSL7 glass, etc.)
    [libSLR/BasicTypes/spectrum_library.cpp]

This script parses the numeric literals only (no code is copied) and stores
them as numpy archives under slr_tpu/spectrum/data/.

Usage: python tools/extract_spectral_data.py [/root/reference]
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "slr_tpu", "spectrum", "data")

FLOAT_RE = r"[-+]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][-+]?[0-9]+)?"


def read(path: str) -> str:
    with open(path, encoding="utf-8", errors="replace") as f:
        return f.read()


def parse_float_array(src: str, name: str) -> np.ndarray:
    """Parse `const float NAME[...] = { ... };` into a 1D float array."""
    m = re.search(
        rf"const\s+float\s+{re.escape(name)}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;",
        src,
        re.S,
    )
    assert m, f"array {name} not found"
    return np.array(
        [float(x) for x in re.findall(FLOAT_RE, m.group(1))], np.float32
    )


def parse_2d_float_array(src: str, name: str, rows: int, cols: int) -> np.ndarray:
    m = re.search(
        rf"const\s+float\s+{re.escape(name)}\s*\[[^\]]*\]\s*\[[^\]]*\]\s*=\s*\{{(.*?)\n\s*\}}\s*;",
        src,
        re.S,
    )
    assert m, f"2d array {name} not found"
    vals = [float(x) for x in re.findall(FLOAT_RE, m.group(1))]
    return np.array(vals, np.float32).reshape(rows, cols)


def main(ref: str) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)

    # --- CMFs, D65, ColorChecker ------------------------------------------
    cs = read(os.path.join(ref, "libSLR/BasicTypes/common_spectra.cpp"))
    sp_cpp = read(os.path.join(ref, "libSLR/BasicTypes/Spectrum.cpp"))
    xbar = parse_float_array(sp_cpp, "xbar_2deg")
    ybar = parse_float_array(sp_cpp, "ybar_2deg")
    zbar = parse_float_array(sp_cpp, "zbar_2deg")
    assert xbar.shape == (471,), xbar.shape
    d65 = parse_float_array(cs, "D65")
    assert d65.shape == (531,), d65.shape
    colorchecker = parse_2d_float_array(cs, "Spectra", 24, 36)
    np.savez_compressed(
        os.path.join(OUT_DIR, "cie.npz"),
        xbar=xbar, ybar=ybar, zbar=zbar,
        cmf_wl_lo=np.float32(360.0), cmf_wl_hi=np.float32(830.0),
        d65=d65, d65_wl_lo=np.float32(300.0), d65_wl_hi=np.float32(830.0),
        colorchecker=colorchecker,
        cc_wl_lo=np.float32(380.0), cc_wl_hi=np.float32(730.0),
    )

    # --- Meng-Simon upsampling grid ---------------------------------------
    sh = read(os.path.join(ref, "libSLR/BasicTypes/Spectrum.h"))
    sh = sh.replace("UINT8_MAX", "255")
    gm = re.search(
        r"spectrum_grid_cell_t\s+spectrum_grid\[\]\s*=\s*\{(.*?)\n\s*\}\s*;", sh, re.S
    )
    assert gm, "spectrum_grid not found"
    cells = re.findall(
        r"\{\s*(\d+)\s*,\s*(\d+)\s*,\s*\{([^}]*)\}\s*\}", gm.group(1)
    )
    inside = np.array([int(c[0]) for c in cells], np.uint8)
    num_points = np.array([int(c[1]) for c in cells], np.uint8)
    idx = np.array(
        [[int(x) for x in re.findall(r"\d+", c[2])] for c in cells], np.int32
    )
    assert inside.shape[0] == 12 * 14, inside.shape

    dm = re.search(
        r"spectrum_data_point_t\s+spectrum_data_points\[\]\s*=\s*\{(.*?)\n\s*\}\s*;",
        sh,
        re.S,
    )
    assert dm, "spectrum_data_points not found"
    points = re.findall(
        r"\{\s*\{([^}]*)\}\s*,\s*\{([^}]*)\}\s*,\s*\{([^}]*)\}\s*\}", dm.group(1)
    )
    xystar = np.array(
        [[float(x) for x in re.findall(FLOAT_RE, p[0])] for p in points],
        np.float32,
    )
    uv = np.array(
        [[float(x) for x in re.findall(FLOAT_RE, p[1])] for p in points],
        np.float32,
    )
    spectra = np.array(
        [[float(x) for x in re.findall(FLOAT_RE, p[2])] for p in points],
        np.float32,
    )
    assert spectra.shape[1] == 95, spectra.shape
    np.savez_compressed(
        os.path.join(OUT_DIR, "upsampling.npz"),
        grid_inside=inside, grid_num_points=num_points, grid_idx=idx,
        dp_xystar=xystar, dp_uv=uv, dp_spectra=spectra,
        grid_width=np.int32(12), grid_height=np.int32(14),
        wl_lo=np.float32(360.0), wl_hi=np.float32(830.0),
        equal_energy_reflectance=np.float32(0.009355121400914532),
    )

    # --- IOR library -------------------------------------------------------
    sl = read(os.path.join(ref, "libSLR/BasicTypes/spectrum_library.cpp"))
    iors = {}
    for name in ("Air", "Water", "Glass_BK7", "Diamond", "Aluminium", "Copper",
                 "Gold", "Iron", "Lead", "Mercury", "Platinum", "Silver",
                 "Titanium"):
        struct = re.search(
            rf"const\s+IndexOfRefraction\s+{name}\s*=\s*\{{(.*?)\}}\s*;", sl, re.S
        )
        if not struct:
            continue
        body = struct.group(1)
        regular = "Regular" in body
        nums = re.findall(FLOAT_RE, re.sub(r"\w+_lambdas\[\d+\]", "", body))
        try:
            etas = parse_float_array(sl, f"{name}_etas")
        except AssertionError:
            continue
        try:
            lambdas = parse_float_array(sl, f"{name}_lambdas")
        except AssertionError:
            lambdas = None
        try:
            ks = parse_float_array(sl, f"{name}_ks")
        except AssertionError:
            ks = None
        if regular:
            # numbers are: count, minWL, maxWL
            count, lo, hi = float(nums[0]), float(nums[1]), float(nums[2])
            lambdas = np.linspace(lo, hi, int(count)).astype(np.float32)
        iors[f"{name}_lambdas"] = lambdas
        iors[f"{name}_etas"] = etas
        iors[f"{name}_ks"] = ks if ks is not None else np.zeros_like(etas)
    np.savez_compressed(os.path.join(OUT_DIR, "iors.npz"), **iors)

    print("wrote", sorted(os.listdir(OUT_DIR)))
    print("data points:", spectra.shape, "cells:", inside.shape)
    print("iors:", sorted({k.split('_')[0] for k in iors}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
