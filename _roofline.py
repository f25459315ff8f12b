"""Analytic FLOP/byte roofline for the bench config (B=4, V=4, 512x640,
bf16, ndepths 8,8,4,4, base 8) on one v5e chip.

Peaks used: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public v5e numbers).
Prints per-piece logical FLOPs, executed FLOPs (packing/banding inflation),
minimum HBM bytes, and the compute/bandwidth roofline in ms — to be combined
with measured ms into the MFU table in BENCH_NOTES.md.
"""

PEAK_FLOPS = 197e12  # bf16
PEAK_BW = 819e9      # bytes/s
BYTES = 2            # bf16

B, V = 4, 4
H, W = 512, 640
BASE = 8
STAGES = [  # (h, w, D, C_feat, G)
    (64, 80, 8, 64, 8),
    (128, 160, 8, 32, 8),
    (256, 320, 4, 16, 4),
    (512, 640, 4, 8, 4),
]


def ms_c(f):
    return f / PEAK_FLOPS * 1e3


def ms_b(b):
    return b / PEAK_BW * 1e3


rows = []


def add(name, flops, ex_flops, bytes_):
    rows.append((name, flops, ex_flops, bytes_))


# ---------------- FPN stem (per image; B*V images) ---------------------------
def conv_flops(h, w, k, ci, co):
    return 2 * h * w * k * k * ci * co


stem = 0.0
stem += conv_flops(H, W, 3, 3, 8) + conv_flops(H, W, 3, 8, 8)
stem += conv_flops(H // 2, W // 2, 5, 8, 16) + 2 * conv_flops(H // 2, W // 2, 3, 16, 16)
stem += conv_flops(H // 4, W // 4, 5, 16, 32) + 2 * conv_flops(H // 4, W // 4, 3, 32, 32)
stem += conv_flops(H // 8, W // 8, 5, 32, 64) + 2 * conv_flops(H // 8, W // 8, 3, 64, 64)
# packed execution: kernel becomes block-banded over k packed columns; the
# dense packed kernel executes ~ (k + kw - 1)/kw x the logical MACs at the
# full/half-res levels (k=16/8 at W=640: kernel width 3 -> (3+k-1) taps over
# k outputs). Executed-FLOP factor per level (measured-shape accounting):
pack_factor_stem = 4.0  # average over levels (k=16 full res: ~6x, coarse: 1x)
stem_bytes = BYTES * (H * W * 3 + H * W * 8 * 2 + (H // 2) * (W // 2) * 16 * 3
                      + (H // 4) * (W // 4) * 32 * 3 + (H // 8) * (W // 8) * 64 * 3)
add("FPN stem (16 imgs)", stem * B * V, stem * B * V * pack_factor_stem,
    stem_bytes * B * V)

# ---------------- FPN top-down ----------------------------------------------
td = 0.0
td += conv_flops(H // 8, W // 8, 1, 64, 64)                    # out1
td += conv_flops(H // 4, W // 4, 1, 32, 64) + conv_flops(H // 4, W // 4, 3, 64, 32)
td += conv_flops(H // 2, W // 2, 1, 16, 64) + conv_flops(H // 2, W // 2, 3, 64, 16)
td += conv_flops(H, W, 1, 8, 64) + conv_flops(H, W, 3, 64, 8)  # inner3+out4
# unfused full-res level moves: up(64ch) + i3(64ch) + sum(64ch) + out (8ch)
td_bytes_unfused = BYTES * B * V * (3 * H * W * 64 + H * W * 8 + H * W * 8
                                    + (H // 2) * (W // 2) * 64)
td_bytes_fused = BYTES * B * V * (H * W * 8 * 2 + (H // 2) * (W // 2) * 64)
add("FPN top-down (unfused)", td * B * V, td * B * V, td_bytes_unfused)
add("FPN top-down (fused kernel)", td * B * V, td * B * V, td_bytes_fused)

# ---------------- warp, per stage (V-1 = 3 src views) -------------------------
BAND = 16
for i, (h, w, D, C, G) in enumerate(STAGES):
    nsrc = V - 1
    out_elems = B * D * h * w
    full = 2 * out_elems * w * BAND * C           # full-width j-contraction
    xwin = min(384, w)
    chunk = 2 * out_elems * xwin * BAND * C       # v3 column-chunked
    # bytes: src feats read (band rows per tile, ~whole src once per view) +
    # warped volume written+read by correlation (fused in practice)
    byt = BYTES * (B * h * w * C * 2 + out_elems * C)
    add(f"warp s{i + 1} x{nsrc} (full-width)", full * nsrc, full * nsrc, byt * nsrc)
    add(f"warp s{i + 1} x{nsrc} (v3 xwin={xwin})", chunk * nsrc, chunk * nsrc, byt * nsrc)

# ---------------- group correlation + attention -------------------------------
for i, (h, w, D, C, G) in enumerate(STAGES):
    nsrc = V - 1
    out_elems = B * D * h * w
    f = 2 * out_elems * C * nsrc                 # dot over C per (d, px)
    byt = BYTES * nsrc * (out_elems * C + out_elems * G) + BYTES * out_elems * G
    add(f"group-cor+attn s{i + 1}", f, f, byt)

# ---------------- reg2d per stage ---------------------------------------------
for i, (h, w, D, C, G) in enumerate(STAGES):
    bd = B * D
    b = BASE
    f = 0.0
    f += 2 * bd * h * w * 9 * G * b
    f += 2 * bd * (h // 2) * (w // 2) * 9 * b * 2 * b + 2 * bd * (h // 2) * (w // 2) * 27 * 2 * b * 2 * b
    f += 2 * bd * (h // 4) * (w // 4) * 9 * 2 * b * 4 * b + 2 * bd * (h // 4) * (w // 4) * 27 * 4 * b * 4 * b
    f += 2 * bd * (h // 8) * (w // 8) * 9 * 4 * b * 8 * b + 2 * bd * (h // 8) * (w // 8) * 27 * 8 * b * 8 * b
    # deconvs
    f += 2 * bd * (h // 4) * (w // 4) * 9 * 8 * b * 4 * b
    f += 2 * bd * (h // 2) * (w // 2) * 9 * 4 * b * 2 * b
    f += 2 * bd * h * w * 9 * 2 * b * b
    f += 2 * bd * h * w * b                      # prob 1x1
    byt = BYTES * bd * h * w * (G + b * 3)       # in + conv0 + final levels
    add(f"reg2d s{i + 1}", f, f * (2.0 if i >= 2 else 1.0), byt)

# ---------------- readout / hypothesis ----------------------------------------
ro_bytes = sum(BYTES * B * D * h * w * 3 for (h, w, D, _, _) in STAGES)
add("readout+hypo (bandwidth)", 0, 0, ro_bytes)

print(f"{'piece':38s} {'GFLOP':>8s} {'exGFLOP':>8s} {'GB':>7s} "
      f"{'ms@MXU':>7s} {'ms@BW':>6s} {'roof ms':>7s}")
tot_c = tot_b = tot_roof = 0.0
groups = {}
for name, f, ef, by in rows:
    roof = max(ms_c(ef), ms_b(by))
    print(f"{name:38s} {f / 1e9:8.1f} {ef / 1e9:8.1f} {by / 1e9:7.3f} "
          f"{ms_c(ef):7.3f} {ms_b(by):6.3f} {roof:7.3f}")
print()
# eval-iter roofline using the FUSED top-down and v3 warp variants
sel = [r for r in rows if "unfused" not in r[0] and "full-width" not in r[0]]
tot = sum(max(ms_c(ef), ms_b(by)) for _, f, ef, by in sel)
logical = sum(f for _, f, ef, by in sel)
print(f"eval-iter roofline (fused td + v3 warp): {tot:.2f} ms "
      f"-> {B / (tot / 1e3):.0f} maps/s ceiling")
print(f"logical GFLOP/iter: {logical / 1e9:.0f} "
      f"(pure-MXU bound {ms_c(logical):.2f} ms)")
