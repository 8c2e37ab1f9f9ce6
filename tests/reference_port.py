"""Implementation-independent oracle: a scalar float32 port of the C++
reference's compute path, transcribed directly from /root/reference/src
(reproject.cpp:37-271, 273-346, 421-437; main.cpp:98-142).

DELIBERATELY imports nothing from image_lens_reproject_tpu's formula
modules (models/projections.py, ops/sampling.py, models/rotation.py): its
whole purpose is to fail tests if anyone "fixes" a reference quirk in the
package (the +cos(theta) fisheye forward, the non-unit equirect ray, the
unguarded /(-z) mirror, truncation-toward-zero sampling, fractions against
the post-wrap/clamp low tap, ...). See VERDICT round 1, missing #3.

Every function is scalar per-pixel Python over numpy float32 values —
structured like the C++ (function-pointer pairs + a per-pixel loop), not
like the package's vectorized fields. Keep it slow and obvious.

Known deliberate deviations from the literal C++ (documented package
sanitizations, replicated here so the comparison is meaningful):
  * wrap uses non-negative (floor) modulo where C's ``(int(s) + W) % W``
    would go negative for s < -W (an out-of-bounds read in the C++);
  * r_px == 0 at an exactly-centered pixel takes the analytic limit
    instead of the C++'s 0/0 NaN (only reachable for odd image sizes);
  * equisolid / stereographic math exists (the reference exits);
    models follow Blender: r_mm = 2 f sin(theta/2) / 2 f tan(theta/2),
    styled like the reference's equidistant pair (+cos(theta) forward,
    perspective-divide + atan inverse).
"""

from __future__ import annotations

import numpy as np

F = np.float32


# --- lens descriptions (plain dicts; no package imports) ---

def rectilinear(focal_length, sensor_w, sensor_h):
    return {"type": "rect", "f": F(focal_length), "sw": F(sensor_w), "sh": F(sensor_h)}


def equidistant(fov, sensor_w=36.0, sensor_h=36.0):
    return {"type": "equidist", "fov": F(fov), "sw": F(sensor_w), "sh": F(sensor_h)}


def equisolid(focal_length, fov, sensor_w, sensor_h):
    return {"type": "equisolid", "f": F(focal_length), "fov": F(fov),
            "sw": F(sensor_w), "sh": F(sensor_h)}


def stereographic(focal_length, fov, sensor_w, sensor_h):
    return {"type": "stereo", "f": F(focal_length), "fov": F(fov),
            "sw": F(sensor_w), "sh": F(sensor_h)}


def equirect(lon_min, lon_max, lat_min, lat_max):
    return {"type": "equirect", "lon_min": F(lon_min), "lon_max": F(lon_max),
            "lat_min": F(lat_min), "lat_max": F(lat_max)}


def full_equirect():
    return equirect(-np.pi, np.pi, -np.pi / 2, np.pi / 2)


# --- rotation builder (main.cpp:98-142): R = R_y(pan) @ (R_x(pitch) @ R_z(roll)) ---

def rotation_matrix(pan_deg, pitch_deg, roll_deg):
    d2r = F(np.pi) / F(180.0)
    rot_x, rot_y, rot_z = F(pitch_deg) * d2r, F(pan_deg) * d2r, F(roll_deg) * d2r
    cx, sx = F(np.cos(rot_x)), F(np.sin(rot_x))
    cy, sy = F(np.cos(rot_y)), F(np.sin(rot_y))
    cz, sz = F(np.cos(rot_z)), F(np.sin(rot_z))
    R_x = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=F)
    R_y = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=F)
    R_z = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=F)
    # multiplyMatrices accumulates in f32
    temp = (R_x.astype(F) @ R_z.astype(F)).astype(F)
    return (R_y @ temp).astype(F)


# --- samplers (reproject.cpp:37-148) ---

def _clampi(v, lo, hi):
    return max(lo, min(hi, v))


def _sample_nearest(img, w, h, c_ch, sx, sy, wrap):
    if wrap:
        lx = (int(sx + F(0.5)) + w) % w
    else:
        lx = _clampi(int(sx + F(0.5)), 0, w - 1)
    ly = _clampi(int(sy + F(0.5)), 0, h - 1)
    return img[ly, lx].copy()


def _sample_bilinear(img, w, h, c_ch, sx, sy, wrap):
    if wrap:
        lx = (int(sx) + w) % w
        ux = (int(sx + F(1.0)) + w) % w
    else:
        lx = _clampi(int(sx), 0, w - 1)
        ux = _clampi(int(sx + F(1.0)), 0, w - 1)
    ly = _clampi(int(sy), 0, h - 1)
    uy = _clampi(int(sy + F(1.0)), 0, h - 1)

    fx = max(F(0.0), min(F(1.0), F(sx - F(lx))))
    fy = max(F(0.0), min(F(1.0), F(sy - F(ly))))
    cfx = F(1.0) - fx
    cfy = F(1.0) - fy

    out = np.empty(c_ch, dtype=F)
    for c in range(c_ch):
        ll = img[ly, lx, c]
        lu = img[ly, ux, c]
        ul = img[uy, lx, c]
        uu = img[uy, ux, c]
        lo = F(fx * lu) + F(cfx * ll)
        up = F(fx * uu) + F(cfx * ul)
        out[c] = F(fy * up) + F(cfy * lo)
    return out


def _cubic(p, x):
    # reproject.cpp:92-98, nested Horner exactly
    return p[1] + F(0.5) * x * (
        p[2] - p[0] + x * (
            F(2.0) * p[0] - F(5.0) * p[1] + F(4.0) * p[2] - p[3] + x * (
                F(3.0) * (p[1] - p[2]) + p[3] - p[0]
            )
        )
    )


def _sample_bicubic(img, w, h, c_ch, sx, sy, wrap):
    xi = []
    for k in (-1.0, 0.0, 1.0, 2.0):
        v = int(sx + F(k))
        xi.append((v + w) % w if wrap else _clampi(v, 0, w - 1))
    yi = [_clampi(int(sy + F(k)), 0, h - 1) for k in (-1.0, 0.0, 1.0, 2.0)]

    fx = max(F(0.0), min(F(1.0), F(sx - F(xi[1]))))
    fy = max(F(0.0), min(F(1.0), F(sy - F(yi[1]))))

    out = np.empty(c_ch, dtype=F)
    for c in range(c_ch):
        # p[xi][yi] layout as in the C++; cubic over y first, then x.
        arr = np.empty(4, dtype=F)
        for a in range(4):
            p = np.array([img[yi[b], xi[a], c] for b in range(4)], dtype=F)
            arr[a] = _cubic(p, fy)
        out[c] = _cubic(arr, fx)
    return out


_SAMPLERS = {"nearest": _sample_nearest, "bilinear": _sample_bilinear,
             "bicubic": _sample_bicubic}


# --- lens projections (reproject.cpp:150-271) ---

def _target_to_vec(lens, img_w, img_h, cx, cy):
    t = lens["type"]
    if t == "rect":
        x = cx / img_w * lens["sw"] / lens["f"]
        y = cy / img_h * lens["sh"] / lens["f"]
        return x, y, F(-1.0)
    if t == "equidist":
        r_px = F(np.sqrt(cx * cx + cy * cy))
        r_mm = r_px / img_w * lens["sw"]
        focal = lens["sw"] / lens["fov"]
        theta = r_mm / focal
        if r_px > 0:
            s = F(np.sin(theta)) / r_px
        else:  # analytic limit (sanitized; C++ divides 0/0)
            s = lens["fov"] / img_w
        return s * cx, s * cy, F(np.cos(theta))
    if t == "equisolid":
        r_px = F(np.sqrt(cx * cx + cy * cy))
        r_mm = r_px * lens["sw"] / img_w
        a = min(F(1.0), max(F(-1.0), r_mm / (F(2.0) * lens["f"])))
        theta = F(2.0) * F(np.arcsin(a))
        s = F(np.sin(theta)) / r_px if r_px > 0 else lens["sw"] / (lens["f"] * img_w)
        return s * cx, s * cy, F(np.cos(theta))
    if t == "stereo":
        r_px = F(np.sqrt(cx * cx + cy * cy))
        r_mm = r_px * lens["sw"] / img_w
        theta = F(2.0) * F(np.arctan(r_mm / (F(2.0) * lens["f"])))
        s = F(np.sin(theta)) / r_px if r_px > 0 else lens["sw"] / (lens["f"] * img_w)
        return s * cx, s * cy, F(np.cos(theta))
    if t == "equirect":
        lon_span = lens["lon_max"] - lens["lon_min"]
        lat_span = lens["lat_max"] - lens["lat_min"]
        lon = (cx / img_w + F(0.5)) * lon_span + lens["lon_min"]
        lat = (cy / img_h + F(0.5)) * lat_span + lens["lat_min"]
        # NOTE the reference quirk: NOT a unit vector (no cos(lat) factor).
        return F(np.sin(lon)), F(np.sin(lat)), -F(np.cos(lon))
    raise ValueError(t)


def _vec_to_source(lens, img_w, img_h, x, y, z):
    t = lens["type"]
    if t == "rect":
        xn = x / -z  # unguarded: behind-camera content mirrors, like the C++
        yn = y / -z
        return (xn * img_w / lens["sw"] * lens["f"],
                yn * img_h / lens["sh"] * lens["f"])
    if t in ("equidist", "equisolid", "stereo"):
        xn = x / -z
        yn = y / -z
        r = F(np.sqrt(xn * xn + yn * yn))
        theta = F(np.arctan(r))
        if t == "equidist":
            focal = lens["sw"] / lens["fov"]
            r_mm = focal * theta
        elif t == "equisolid":
            r_mm = F(2.0) * lens["f"] * F(np.sin(F(0.5) * theta))
        else:
            r_mm = F(2.0) * lens["f"] * F(np.tan(F(0.5) * theta))
        r_px = r_mm / lens["sw"] * img_w
        if r > 0:
            return xn / r * r_px, yn / r * r_px
        # analytic limit (sanitized; C++ divides 0/0)
        if t == "equidist":
            slope = img_w / lens["fov"]
        else:
            slope = lens["f"] * img_w / lens["sw"]
        return xn * slope, yn * slope
    if t == "equirect":
        theta = -F(np.arctan2(-x, -z))
        phi = F(np.arcsin(y / F(np.sqrt(x * x + y * y + z * z))))
        lon_span = lens["lon_max"] - lens["lon_min"]
        lat_span = lens["lat_max"] - lens["lat_min"]
        cx = ((theta - lens["lon_min"]) / lon_span - F(0.5)) * img_w
        cy = ((phi - lens["lat_min"]) / lat_span - F(0.5)) * img_h
        return cx, cy
    raise ValueError(t)


def _wrap_for_input(lens):
    # reproject.cpp:386-394: wraparound iff equirect input spans 2*pi
    if lens["type"] != "equirect":
        return False
    return abs(float(lens["lon_max"] - lens["lon_min"]) - 2 * np.pi) < 1e-5


# --- the hot loop (reproject.cpp:273-346) ---

def reproject(src, in_lens, out_lens, out_h, out_w, num_samples, interp,
              rotation=None):
    """(H, W, C) f32 -> (out_h, out_w, C) f32, scalar per-pixel."""
    src = np.asarray(src, dtype=F)
    in_h, in_w, c_ch = src.shape
    sampler = _SAMPLERS[interp]
    wrap = _wrap_for_input(in_lens)
    iw, ih = F(in_w), F(in_h)
    ow, oh = F(out_w), F(out_h)
    out = np.empty((out_h, out_w, c_ch), dtype=F)
    normalize = F(1.0) / F(num_samples * num_samples)

    for y in range(out_h):
        for x in range(out_w):
            cx = F(x + 0.5) - ow * F(0.5)
            cy = F(y + 0.5) - oh * F(0.5)
            accum = np.zeros(c_ch, dtype=F)
            for ssx in range(num_samples):
                scx = cx + F(ssx + 1.0) / F(num_samples + 1.0) - F(0.5)
                for ssy in range(num_samples):
                    scy = cy + F(ssy + 1.0) / F(num_samples + 1.0) - F(0.5)
                    vx, vy, vz = _target_to_vec(out_lens, ow, oh, scx, scy)
                    if rotation is not None:
                        rm = rotation
                        nx = rm[0, 0] * vx + rm[0, 1] * vy + rm[0, 2] * vz
                        ny = rm[1, 0] * vx + rm[1, 1] * vy + rm[1, 2] * vz
                        nz = rm[2, 0] * vx + rm[2, 1] * vy + rm[2, 2] * vz
                        vx, vy, vz = F(nx), F(ny), F(nz)
                    sx, sy = _vec_to_source(in_lens, iw, ih, vx, vy, vz)
                    sx = (sx - F(0.5)) + iw * F(0.5)
                    sy = (sy - F(0.5)) + ih * F(0.5)
                    accum += sampler(src, in_w, in_h, c_ch, sx, sy, wrap)
            out[y, x] = accum * normalize
    return out


# --- post-process (reproject.cpp:421-437) ---

def post_process(img, exposure, reinhard):
    """In-place-style exposure + extended Reinhard on min(C, 3) channels."""
    img = np.array(img, dtype=F, copy=True)
    ch = min(img.shape[2], 3)
    e = F(exposure)
    rh = F(reinhard)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            for c in range(ch):
                v = img[y, x, c] * e
                v = v * (F(1.0) + v / (rh * rh)) / (F(1.0) + v)
                img[y, x, c] = v
    return img
