"""Independent numpy re-derivation of the reference develop pass.

This is the test oracle: a straight, HWC-vectorized float32 transcription of
wgpu_shader.wgsl:265-337 (and the WB gain mapping of
gpu_image_processing.rs:236-238), written independently of the framework
code so transcription errors on either side show up as mismatches.
"""

from __future__ import annotations

import numpy as np

F = np.float32

M1 = np.array(
    [
        [0.4122214708, 0.5363325363, 0.0514459929],
        [0.2119034982, 0.6806995451, 0.1073969566],
        [0.0883024619, 0.2817188376, 0.6299787005],
    ],
    dtype=F,
)
M1_INV = np.array(
    [
        [4.0767416621, -3.3077115913, 0.2309699292],
        [-1.2684380046, 2.6097574011, -0.3413193965],
        [-0.0041960863, -0.7034186147, 1.7076147010],
    ],
    dtype=F,
)
M2 = np.array(
    [
        [0.2104542553, 0.7936177850, -0.0040720468],
        [1.9779984951, -2.4285922050, 0.4505937099],
        [0.0259040371, 0.7827717662, -0.8086757660],
    ],
    dtype=F,
)
M2_INV = np.array(
    [
        [1.0, 0.3963377774, 0.2158037573],
        [1.0, -0.1055613458, -0.0638541728],
        [1.0, -0.0894841775, -1.2914855480],
    ],
    dtype=F,
)
TWO_PI = F(6.28318530718)


def srgb_to_linear(c):
    c = c.astype(F)
    return np.where(c <= 0.04045, c / F(12.92),
                    np.power((c + F(0.055)) / F(1.055), F(2.4))).astype(F)


def linear_to_srgb(c):
    c = c.astype(F)
    return np.where(c <= 0.0031308, c * F(12.92),
                    F(1.055) * np.power(np.maximum(c, 0), F(1 / 2.4)) - F(0.055)).astype(F)


def to_oklch(rgb):
    lms = rgb @ M1.T
    lms = np.cbrt(np.maximum(lms, 0)).astype(F)
    lab = lms @ M2.T
    L = lab[..., 0]
    C = np.sqrt(lab[..., 1] ** 2 + lab[..., 2] ** 2).astype(F)
    h = (np.arctan2(lab[..., 2], lab[..., 1]) / TWO_PI).astype(F)
    h = np.where(h < 0, h + F(1.0), h)
    return L, C, h


def from_oklch(L, C, h):
    ang = h * TWO_PI
    lab = np.stack([L, C * np.cos(ang), C * np.sin(ang)], axis=-1).astype(F)
    lms = (lab @ M2_INV.T).astype(F)
    lms = lms * lms * lms
    return (lms @ M1_INV.T).astype(F)


def tone(rgb, exposure, contrast, shadow, highlight, black, white):
    rgb = rgb * F(2.0 ** exposure)
    luma = (rgb @ np.array([0.2126, 0.7152, 0.0722], dtype=F))[..., None]
    rgb = rgb * (F(1.0) + F(shadow) * np.clip(1 - luma, 0, 1))
    rgb = rgb * (F(1.0) + F(highlight) * np.clip(luma, 0, 1))
    t = np.clip(luma, 0, 1)
    if black != 0.0:
        rgb = rgb + F(black) * (1 - t) ** 2
    if white != 0.0:
        rgb = rgb + F(white) * t**2
    if contrast != 0.0:
        rgb = (rgb - F(0.5)) * F(1.0 + contrast) + F(0.5)
    return np.clip(rgb, 0, 1).astype(F)


def vignette(rgb, value, h, w):
    strength = F((-value / 100.0) * 2.0)
    if strength == 0:
        return rgb
    ys, xs = np.mgrid[0:h, 0:w].astype(F)
    cy = (ys / F(h) - F(0.5)) * F(1.5)
    cx = (xs / F(w) - F(0.5)) * F(1.5)
    dist = np.sqrt(cx * cx + cy * cy)
    falloff = np.clip((dist - F(0.25)) / F(0.75), 0, 1) ** F(1.5)
    gain = np.clip(1 - strength * falloff, 0, 4)[..., None]
    return (rgb * gain).astype(F)


def lens_distortion(rgb, value):
    strength = F(-0.5 * (value / 100.0))
    if strength == 0:
        return rgb
    h, w = rgb.shape[:2]
    wf, hf = F(w), F(h)
    ys, xs = np.mgrid[0:h, 0:w].astype(F)
    u = xs / wf
    v = ys / hf
    cu = (u - F(0.5)) * (wf / hf)
    cv = v - F(0.5)
    r2 = cu * cu + cv * cv
    du = cu / (1 + strength * r2)
    dv = cv / (1 + strength * r2)
    fu = du / (wf / hf) + F(0.5)
    fv = dv + F(0.5)
    oob = (fu < 0) | (fu > 1) | (fv < 0) | (fv > 1)
    px = fu * (wf - 1)
    py = fv * (hf - 1)
    x0 = np.floor(px)
    y0 = np.floor(py)
    tx = (px - x0)[..., None]
    ty = (py - y0)[..., None]
    x0i = np.clip(x0.astype(np.int64), 0, w - 1)
    y0i = np.clip(y0.astype(np.int64), 0, h - 1)
    x1i = np.minimum(x0i + 1, w - 1)
    y1i = np.minimum(y0i + 1, h - 1)
    c00 = rgb[y0i, x0i]
    c10 = rgb[y0i, x1i]
    c01 = rgb[y1i, x0i]
    c11 = rgb[y1i, x1i]
    cx0 = c00 * (1 - tx) + c10 * tx
    cx1 = c01 * (1 - tx) + c11 * tx
    out = (cx0 * (1 - ty) + cx1 * ty).astype(F)
    out[oob] = 0.0
    return out


def lut_fetch(lut, idx):
    return np.clip(lut[idx], 0, 65535)


def develop(rgb_hwc, mask_params, masks_hw):
    """rgb_hwc: f32 [H,W,3] linear. mask_params: list of dicts with keys
    wb_temperature, wb_tint, exposure, contrast, shadow, highlight, black,
    white, vignette, lens_distortion, luts (list of 4 i32[65536]).
    masks_hw: [M,H,W] f32. Returns sRGB f32 [H,W,3] in [0,1]."""
    h, w = rgb_hwc.shape[:2]
    main = mask_params[0]
    rgb = lens_distortion(rgb_hwc.astype(F), main["lens_distortion"])
    rgb = vignette(rgb, main["vignette"], h, w)

    for k, p in enumerate(mask_params):
        sel = masks_hw[k] == 1.0
        gains = np.array(
            [
                1.0 + 0.5 * (p["wb_temperature"] / 100.0),
                1.0 - 0.25 * (p["wb_tint"] / 100.0),
                1.0 - 0.5 * (p["wb_temperature"] / 100.0),
            ],
            dtype=F,
        )
        x = rgb * gains
        x = tone(
            x,
            p["exposure"],
            p["contrast"] / 100.0,
            p["shadow"] / 100.0,
            p["highlight"] / 100.0,
            p["black"] / 100.0,
            p["white"] / 100.0,
        )
        idx = (x * F(65535.0)).astype(np.int64)
        xc = lut_fetch(p["luts"][0], idx).astype(F) / F(65535.0)
        # v1 channel selector (slang tone_curve_lut): channels other than
        # the selected one skip the curve (but keep WB + tone).
        ch = p.get("brightness_channel", 3)
        if ch != 3:
            chan_sel = np.array([ch == 0, ch == 1, ch == 2])
            xc = np.where(chan_sel[None, None, :], xc, x).astype(F)
        rgb = np.where(sel[..., None], xc, rgb).astype(F)

    L, C, H = to_oklch(rgb)
    for k, p in enumerate(mask_params):
        sel = masks_hw[k] == 1.0
        h_idx = (H * F(65535.0)).astype(np.int64)
        new_h = lut_fetch(p["luts"][1], h_idx).astype(F) / F(65535.0)
        sat_g = lut_fetch(p["luts"][2], h_idx).astype(F) / F(32767.5)
        light_g = lut_fetch(p["luts"][3], h_idx).astype(F) / F(32767.5)
        H = np.where(sel, new_h, H).astype(F)
        C = np.where(sel, C * sat_g, C).astype(F)
        L = np.where(sel, L * light_g, L).astype(F)
    rgb = from_oklch(L, C, H)
    return np.clip(linear_to_srgb(rgb), 0, 1).astype(F)
