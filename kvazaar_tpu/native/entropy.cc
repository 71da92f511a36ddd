// Native host-side entropy coder for the fixed 16x16 CTU grid.
//
// This is the framework's C++ runtime component: it consumes the
// device-computed decision/coefficient tensors (modes + quantized levels)
// and produces the CABAC-coded slice substreams. It replaces the Python
// syntax writer on the hot path, mirroring how the reference keeps its
// entropy coding in C (kvazaar src/cabac.c, src/encode_coding_tree.c) while
// we keep the pixel math on the TPU.
//
// Scope (current grid): CTU == CU == PU == TU == 16x16 luma / 8x8 chroma,
// diagonal scans only (mode-dependent scans apply only to TUs <= 8x8 luma /
// 4x4 chroma), no sign-data-hiding, intra slices.

#include <stdint.h>
#include <string.h>

#include "tables.h"

namespace {

struct BitWriter {
  uint8_t* buf;
  int64_t cap;
  int64_t len = 0;   // complete bytes written
  uint32_t cur = 0;  // bit accumulator
  int nbits = 0;

  void u(uint32_t value, int bits) {
    cur = (cur << bits) | value;
    nbits += bits;
    while (nbits >= 8) {
      nbits -= 8;
      if (len < cap) buf[len] = (uint8_t)(cur >> nbits);
      len++;
    }
    cur &= (1u << nbits) - 1;
  }
  void align_one() {
    u(1, 1);
    if (nbits) u(0, 8 - nbits);
  }
};

struct Cabac {
  uint32_t low = 0;
  uint32_t range = 510;
  int bits_left = 23;
  int num_buffered = 0;
  uint32_t buffered = 0xFF;
  uint8_t state[KVZ_NUM_CTX];
  uint8_t mps[KVZ_NUM_CTX];
  BitWriter* bw;

  void init_contexts(int qp, int init_type = 0) {
    memcpy(state, kCtxInitState + (init_type * 52 + qp) * KVZ_NUM_CTX,
           KVZ_NUM_CTX);
    memcpy(mps, kCtxInitMps + (init_type * 52 + qp) * KVZ_NUM_CTX,
           KVZ_NUM_CTX);
  }
  void copy_contexts(const Cabac& o) {
    memcpy(state, o.state, KVZ_NUM_CTX);
    memcpy(mps, o.mps, KVZ_NUM_CTX);
  }
  void reset_engine() {
    low = 0; range = 510; bits_left = 23; num_buffered = 0; buffered = 0xFF;
  }

  void write_out() {
    uint32_t lead = low >> (24 - bits_left);
    bits_left += 8;
    low &= 0xFFFFFFFFu >> bits_left;
    if (lead == 0xFF) {
      num_buffered++;
    } else if (num_buffered > 0) {
      uint32_t carry = lead >> 8;
      bw->u((buffered + carry) & 0xFF, 8);
      buffered = lead & 0xFF;
      uint32_t fill = (0xFF + carry) & 0xFF;
      while (num_buffered > 1) { bw->u(fill, 8); num_buffered--; }
    } else {
      num_buffered = 1;
      buffered = lead;
    }
  }
  inline void test_write() { if (bits_left < 12) write_out(); }

  void encode_bin(int ctx, int binval) {
    uint8_t s = state[ctx];
    uint32_t lps = kLpsTable[s * 4 + ((range >> 6) & 3)];
    range -= lps;
    if (binval != mps[ctx]) {
      int nbits = kRenorm[lps >> 3];
      low = (low + range) << nbits;
      range = lps << nbits;
      if (s == 0) mps[ctx] ^= 1;
      state[ctx] = kTransLps[s];
      bits_left -= nbits;
      test_write();
    } else {
      state[ctx] = kTransMps[s];
      if (range >= 256) return;
      low <<= 1;
      range <<= 1;
      bits_left -= 1;
      test_write();
    }
  }
  void encode_bin_ep(int binval) {
    low <<= 1;
    if (binval) low += range;
    bits_left -= 1;
    test_write();
  }
  void encode_bins_ep(uint32_t pattern, int n) {
    while (n > 8) {
      n -= 8;
      low = (low << 8) + range * ((pattern >> n) & 0xFF);
      bits_left -= 8;
      test_write();
    }
    if (n > 0) {
      low = (low << n) + range * (pattern & ((1u << n) - 1));
      bits_left -= n;
      test_write();
    }
  }
  void encode_bin_trm(int binval) {
    range -= 2;
    if (binval) {
      low += range;
      low <<= 7;
      range = 2 << 7;
      bits_left -= 7;
    } else if (range >= 256) {
      return;
    } else {
      low <<= 1;
      range <<= 1;
      bits_left -= 1;
    }
    test_write();
  }
  void finish() {
    if (low >> (32 - bits_left)) {
      bw->u(buffered + 1, 8);
      while (num_buffered > 1) { bw->u(0x00, 8); num_buffered--; }
      low -= 1u << (32 - bits_left);
    } else {
      if (num_buffered > 0) bw->u(buffered, 8);
      while (num_buffered > 1) { bw->u(0xFF, 8); num_buffered--; }
    }
    bw->u(low >> 8, 24 - bits_left);
  }
  void golomb_remaining(uint32_t value, int rice) {
    if ((value >> rice) < 3) {
      int len = value >> rice;
      encode_bins_ep((1u << (len + 1)) - 2, len + 1);
      if (rice) encode_bins_ep(value & ((1u << rice) - 1), rice);
    } else {
      int len = rice;
      value -= 3u << rice;
      while (value >= (1u << len)) {
        value -= 1u << len;
        len++;
      }
      encode_bins_ep((1u << (3 + len + 1 - rice)) - 2, 3 + len + 1 - rice);
      encode_bins_ep(value, len);
    }
  }
};

void encode_residual(Cabac& cab, const int32_t* coeffs, int log2_size,
                     int c_idx, int sdh) {
  const int size = 1 << log2_size;
  const int nn = size * size;
  const uint16_t* scan = (size == 16) ? kScanDiag16 : kScanDiag8;
  const uint16_t* cg_scan = (size == 16) ? kCgScanDiag16 : kCgScanDiag8;
  const int width_cg = size >> 2;

  int32_t flat[256];
  int last_scan_pos = -1;
  for (int i = 0; i < nn; i++) {
    flat[i] = coeffs[scan[i]];
    if (flat[i]) last_scan_pos = i;
  }
  // last position
  {
    int lp = scan[last_scan_pos];
    int lx = lp & (size - 1), ly = lp >> log2_size;
    int offset, shift;
    int base_x = KVZ_CTX_LAST_SIG_X, base_y = KVZ_CTX_LAST_SIG_Y;
    if (c_idx) {
      base_x += 15; base_y += 15;
      offset = 0; shift = log2_size - 2;
    } else {
      offset = 3 * (log2_size - 2) + ((log2_size - 1) >> 2);
      shift = (log2_size + 1) >> 2;
    }
    int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
    int cmax = (log2_size << 1) - 1;
    for (int i = 0; i < gx; i++) cab.encode_bin(base_x + offset + (i >> shift), 1);
    if (gx < cmax) cab.encode_bin(base_x + offset + (gx >> shift), 0);
    for (int i = 0; i < gy; i++) cab.encode_bin(base_y + offset + (i >> shift), 1);
    if (gy < cmax) cab.encode_bin(base_y + offset + (gy >> shift), 0);
    if (gx > 3) cab.encode_bins_ep(lx - kMinInGroup[gx], (gx - 2) >> 1);
    if (gy > 3) cab.encode_bins_ep(ly - kMinInGroup[gy], (gy - 2) >> 1);
  }

  const int last_cg = last_scan_pos >> 4;
  uint8_t csbf_map[64];
  memset(csbf_map, 0, sizeof(csbf_map));
  int c1 = 1;

  for (int cg = last_cg; cg >= 0; cg--) {
    const int cg_pos = cg_scan[cg];
    const int cgx = cg_pos % width_cg, cgy = cg_pos / width_cg;
    const int sub_pos = cg << 4;
    int cg_has = 0;
    for (int i = 0; i < 16; i++) if (flat[sub_pos + i]) { cg_has = 1; break; }

    int right = (cgx + 1 < width_cg) ? csbf_map[cgy * width_cg + cgx + 1] : 0;
    int below = (cgy + 1 < width_cg) ? csbf_map[(cgy + 1) * width_cg + cgx] : 0;
    int infer_sb_dc = 0;
    int coded_csbf;
    if (cg == last_cg || cg == 0) {
      coded_csbf = 1;
    } else {
      int ctx = KVZ_CTX_CODED_SUB_BLOCK_FLAG + ((right || below) ? 1 : 0) +
                (c_idx ? 2 : 0);
      cab.encode_bin(ctx, cg_has);
      coded_csbf = cg_has;
      infer_sb_dc = 1;
    }
    csbf_map[cgy * width_cg + cgx] = coded_csbf;
    if (!coded_csbf) continue;

    // significance map (reverse scan)
    int sig_pos[16];
    int nsig = 0;
    int start = (cg == last_cg) ? last_scan_pos - 1 : sub_pos + 15;
    if (cg == last_cg) sig_pos[nsig++] = last_scan_pos;
    const int pattern = right + 2 * below;
    for (int pos = start; pos >= sub_pos; pos--) {
      int val = flat[pos] != 0;
      if (pos == sub_pos && infer_sb_dc && nsig == 0) {
        sig_pos[nsig++] = pos;
        continue;
      }
      int rp = scan[pos];
      int x = rp & (size - 1), y = rp >> log2_size;
      int sig;
      if (x + y == 0) {
        sig = 0;
      } else {
        int xp = x & 3, yp = y & 3;
        int cnt;
        if (pattern == 0)
          cnt = (xp + yp == 0) ? 2 : (xp + yp < 3) ? 1 : 0;
        else if (pattern == 1)
          cnt = (yp == 0) ? 2 : (yp == 1) ? 1 : 0;
        else if (pattern == 2)
          cnt = (xp == 0) ? 2 : (xp == 1) ? 1 : 0;
        else
          cnt = 2;
        if (c_idx == 0) {
          if ((x >> 2) + (y >> 2) > 0) cnt += 3;
          cnt += (log2_size == 3) ? 9 : 21;
        } else {
          cnt += (log2_size == 3) ? 9 : 12;
        }
        sig = cnt;
      }
      cab.encode_bin(KVZ_CTX_SIG_COEFF_FLAG + sig + (c_idx ? 27 : 0), val);
      if (val) sig_pos[nsig++] = pos;
    }
    if (!nsig) continue;

    // level data
    int abs_lev[16], signs[16];
    for (int i = 0; i < nsig; i++) {
      int32_t v = flat[sig_pos[i]];
      abs_lev[i] = v < 0 ? -v : v;
      signs[i] = v < 0;
    }
    int ctx_set = (cg > 0 && c_idx == 0) ? 2 : 0;
    if (c1 == 0) ctx_set++;
    c1 = 1;
    int first_g1 = -1;
    int n_c1 = nsig < 8 ? nsig : 8;
    for (int i = 0; i < n_c1; i++) {
      int g1 = abs_lev[i] > 1;
      cab.encode_bin(KVZ_CTX_COEFF_ABS_LEVEL_GREATER1_FLAG +
                         (c_idx ? 16 : 0) + ctx_set * 4 + c1, g1);
      if (g1) {
        c1 = 0;
        if (first_g1 < 0) first_g1 = i;
      } else if (c1 > 0 && c1 < 3) {
        c1++;
      }
    }
    if (first_g1 >= 0) {
      cab.encode_bin(KVZ_CTX_COEFF_ABS_LEVEL_GREATER2_FLAG +
                         (c_idx ? 4 : 0) + ctx_set,
                     abs_lev[first_g1] > 2);
    }
    // sign bits; with SDH the sign of the lowest-scan-pos coefficient
    // is omitted when the nonzero span covers >= 4 scan positions (the
    // decoder infers it from the abs-sum parity, which the device
    // quantizer already fixed up)
    int hide = sdh && (sig_pos[0] - sig_pos[nsig - 1] > 3);
    int n_signs = hide ? nsig - 1 : nsig;
    uint32_t sign_pat = 0;
    for (int i = 0; i < n_signs; i++) sign_pat = (sign_pat << 1) | signs[i];
    if (n_signs) cab.encode_bins_ep(sign_pat, n_signs);
    int rice = 0, first_coeff2 = 1;
    for (int i = 0; i < nsig; i++) {
      int base = (i < 8) ? (2 + first_coeff2) : 1;
      if (abs_lev[i] >= base) {
        cab.golomb_remaining(abs_lev[i] - base, rice);
        if (abs_lev[i] > (3 << rice) && rice < 4) rice++;
      }
      if (abs_lev[i] >= 2) first_coeff2 = 0;
    }
  }
}

void encode_ctu(Cabac& cab, int r, int c, int cols, int sdh,
                const int32_t* modes,
                const int32_t* ly, const int32_t* lcb, const int32_t* lcr) {
  const int b = r * cols + c;
  // split_cu_flag at 16x16 (> min CB 8): always 0, neighbour depths all 0
  cab.encode_bin(KVZ_CTX_SPLIT_CU_FLAG + 0, 0);
  // intra mode: above PU is always in the CTU row above -> candB = DC(1);
  // candA = left mode or DC
  int mode = modes[b];
  int a = (c > 0) ? modes[b - 1] : 1;
  int bm = 1;
  int mpm[3];
  if (a == bm) {
    if (a < 2) { mpm[0] = 0; mpm[1] = 1; mpm[2] = 26; }
    else { mpm[0] = a; mpm[1] = 2 + ((a + 29) % 32);
           mpm[2] = 2 + ((a - 2 + 1) % 32); }
  } else {
    mpm[0] = a; mpm[1] = bm;
    if (a != 0 && bm != 0) mpm[2] = 0;
    else if (a + bm < 2) mpm[2] = 26;
    else mpm[2] = 1;
  }
  int idx = -1;
  for (int i = 0; i < 3; i++) if (mpm[i] == mode) { idx = i; break; }
  if (idx >= 0) {
    cab.encode_bin(KVZ_CTX_PREV_INTRA_LUMA_PRED_FLAG, 1);
    if (idx == 0) cab.encode_bin_ep(0);
    else { cab.encode_bin_ep(1); cab.encode_bin_ep(idx - 1); }
  } else {
    cab.encode_bin(KVZ_CTX_PREV_INTRA_LUMA_PRED_FLAG, 0);
    int rem = mode;
    int s0 = mpm[0], s1 = mpm[1], s2 = mpm[2], t;
    if (s0 > s1) { t = s0; s0 = s1; s1 = t; }
    if (s1 > s2) { t = s1; s1 = s2; s2 = t; }
    if (s0 > s1) { t = s0; s0 = s1; s1 = t; }
    if (rem > s2) rem--;
    if (rem > s1) rem--;
    if (rem > s0) rem--;
    cab.encode_bins_ep(rem, 5);
  }
  // chroma: derived mode
  cab.encode_bin(KVZ_CTX_INTRA_CHROMA_PRED_MODE, 0);
  // transform tree: TU == CU, no split flag (max depth 0)
  const int32_t* cy = ly + b * 256;
  const int32_t* cb_ = lcb + b * 64;
  const int32_t* cr_ = lcr + b * 64;
  int cbf_y = 0, cbf_cb = 0, cbf_cr = 0;
  for (int i = 0; i < 256; i++) if (cy[i]) { cbf_y = 1; break; }
  for (int i = 0; i < 64; i++) if (cb_[i]) { cbf_cb = 1; break; }
  for (int i = 0; i < 64; i++) if (cr_[i]) { cbf_cr = 1; break; }
  cab.encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cb);
  cab.encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cr);
  cab.encode_bin(KVZ_CTX_CBF_LUMA + 1, cbf_y);  // trafo depth 0 -> ctx 1
  if (cbf_y) encode_residual(cab, cy, 4, 0, sdh);
  if (cbf_cb) encode_residual(cab, cb_, 3, 1, sdh);
  if (cbf_cr) encode_residual(cab, cr_, 3, 2, sdh);
}

// ---------------------------------------------------------------------------
// Quadtree (multi-depth) intra slice writer: the flagship CTB-64 path.
// Consumes the per-8x8-cell size/mode maps and full coefficient planes of
// models/intra_md.py and writes coding_quadtree()/coding_unit()/
// transform_unit() syntax plus sao() at each CTU head. Mirrors
// engine/md_writer.py (validated against the decoder); C++ because host
// entropy is the serial bottleneck once device compute is batched.
// Reference parity: kvazaar src/encode_coding_tree.c:745 (tree),
// :467 (intra mode), :193 (TU), generic/encode_coding_tree-generic.c
// (residual), all re-derived from spec 7.3.8.

static const uint16_t* scan_tab(int log2, int si) {
  switch (log2) {
    case 2: return si == 0 ? kScanDiag4 : si == 1 ? kScanHor4 : kScanVer4;
    case 3: return si == 0 ? kScanDiag8 : si == 1 ? kScanHor8 : kScanVer8;
    case 4: return kScanDiag16;
    default: return kScanDiag32;
  }
}
static const uint16_t* cg_scan_tab(int log2, int si) {
  switch (log2) {
    case 2: return si == 0 ? kCgScanDiag4 : si == 1 ? kCgScanHor4
                                                    : kCgScanVer4;
    case 3: return si == 0 ? kCgScanDiag8 : si == 1 ? kCgScanHor8
                                                    : kCgScanVer8;
    case 4: return kCgScanDiag16;
    default: return kCgScanDiag32;
  }
}

static int intra_scan_idx(int mode, int log2, int c_idx) {
  // mode-dependent coefficient scan (spec 7.4.9.11)
  if (log2 == 2 || (log2 == 3 && c_idx == 0)) {
    if (mode >= 6 && mode <= 14) return 2;   // vertical scan
    if (mode >= 22 && mode <= 30) return 1;  // horizontal scan
  }
  return 0;
}

// sig_coeff_flag context increment (spec 9.3.4.2.5)
static inline int sig_ctx(int x, int y, int log2, int c_idx, int scan_idx,
                          int right, int below) {
  int sig;
  if (log2 == 2) {
    sig = kSigCtx4x4[(y << 2) + x];
  } else if (x + y == 0) {
    sig = 0;
  } else {
    int xp = x & 3, yp = y & 3;
    int prev = right + 2 * below;
    if (prev == 0)      sig = (xp + yp == 0) ? 2 : (xp + yp < 3) ? 1 : 0;
    else if (prev == 1) sig = (yp == 0) ? 2 : (yp == 1) ? 1 : 0;
    else if (prev == 2) sig = (xp == 0) ? 2 : (xp == 1) ? 1 : 0;
    else                sig = 2;
    if (c_idx == 0) {
      if ((x >> 2) + (y >> 2) > 0) sig += 3;
      sig += (log2 == 3) ? (scan_idx == 0 ? 9 : 15) : 21;
    } else {
      sig += (log2 == 3) ? 9 : 12;
    }
  }
  return sig + (c_idx ? 27 : 0);
}

// Generic residual_coding() over a plane window (any size 4..32, any scan).
static void encode_residual_any(Cabac& cab, const int32_t* plane,
                                int stride, int x0, int y0, int log2,
                                int c_idx, int scan_idx, int sdh) {
  const int size = 1 << log2;
  const int nn = size * size;
  const uint16_t* scan = scan_tab(log2, scan_idx);
  const uint16_t* cg_scan = cg_scan_tab(log2, scan_idx);
  const int width_cg = size >> 2 ? size >> 2 : 1;

  int32_t flat[1024];
  int last_scan_pos = -1;
  const int32_t* base = plane + (int64_t)y0 * stride + x0;
  for (int i = 0; i < nn; i++) {
    int rp = scan[i];
    flat[i] = base[(rp >> log2) * stride + (rp & (size - 1))];
    if (flat[i]) last_scan_pos = i;
  }
  // last position (swap coords under the vertical scan)
  {
    int lp = scan[last_scan_pos];
    int lx = lp & (size - 1), ly = lp >> log2;
    if (scan_idx == 2) { int t = lx; lx = ly; ly = t; }
    int offset, shift;
    int base_x = KVZ_CTX_LAST_SIG_X, base_y = KVZ_CTX_LAST_SIG_Y;
    if (c_idx) {
      base_x += 15; base_y += 15;
      offset = 0; shift = log2 - 2;
    } else {
      offset = 3 * (log2 - 2) + ((log2 - 1) >> 2);
      shift = (log2 + 1) >> 2;
    }
    int gx = kGroupIdx[lx], gy = kGroupIdx[ly];
    int cmax = (log2 << 1) - 1;
    for (int i = 0; i < gx; i++)
      cab.encode_bin(base_x + offset + (i >> shift), 1);
    if (gx < cmax) cab.encode_bin(base_x + offset + (gx >> shift), 0);
    for (int i = 0; i < gy; i++)
      cab.encode_bin(base_y + offset + (i >> shift), 1);
    if (gy < cmax) cab.encode_bin(base_y + offset + (gy >> shift), 0);
    if (gx > 3) cab.encode_bins_ep(lx - kMinInGroup[gx], (gx - 2) >> 1);
    if (gy > 3) cab.encode_bins_ep(ly - kMinInGroup[gy], (gy - 2) >> 1);
  }

  const int last_cg = last_scan_pos >> 4;
  uint8_t csbf_map[64];
  memset(csbf_map, 0, sizeof(csbf_map));
  int c1 = 1;

  for (int cg = last_cg; cg >= 0; cg--) {
    const int cg_pos = cg_scan[cg];
    const int cgx = cg_pos % width_cg, cgy = cg_pos / width_cg;
    const int sub_pos = cg << 4;
    int cg_has = 0;
    for (int i = 0; i < 16; i++)
      if (flat[sub_pos + i]) { cg_has = 1; break; }

    int right = (cgx + 1 < width_cg) ? csbf_map[cgy * width_cg + cgx + 1]
                                     : 0;
    int below = (cgy + 1 < width_cg) ? csbf_map[(cgy + 1) * width_cg + cgx]
                                     : 0;
    int infer_sb_dc = 0;
    int coded_csbf;
    if (cg == last_cg || cg == 0) {
      coded_csbf = 1;
    } else {
      int ctx = KVZ_CTX_CODED_SUB_BLOCK_FLAG + ((right || below) ? 1 : 0) +
                (c_idx ? 2 : 0);
      cab.encode_bin(ctx, cg_has);
      coded_csbf = cg_has;
      infer_sb_dc = 1;
    }
    csbf_map[cgy * width_cg + cgx] = coded_csbf;
    if (!coded_csbf) continue;

    int sig_pos[16];
    int nsig = 0;
    int start = (cg == last_cg) ? last_scan_pos - 1 : sub_pos + 15;
    if (cg == last_cg) sig_pos[nsig++] = last_scan_pos;
    for (int pos = start; pos >= sub_pos; pos--) {
      int val = flat[pos] != 0;
      if (pos == sub_pos && infer_sb_dc && nsig == 0) {
        sig_pos[nsig++] = pos;
        continue;
      }
      int rp = scan[pos];
      int x = rp & (size - 1), y = rp >> log2;
      cab.encode_bin(KVZ_CTX_SIG_COEFF_FLAG +
                         sig_ctx(x, y, log2, c_idx, scan_idx, right, below),
                     val);
      if (val) sig_pos[nsig++] = pos;
    }
    if (!nsig) continue;

    int abs_lev[16], signs[16];
    for (int i = 0; i < nsig; i++) {
      int32_t v = flat[sig_pos[i]];
      abs_lev[i] = v < 0 ? -v : v;
      signs[i] = v < 0;
    }
    int ctx_set = (cg > 0 && c_idx == 0) ? 2 : 0;
    if (c1 == 0) ctx_set++;
    c1 = 1;
    int first_g1 = -1;
    int n_c1 = nsig < 8 ? nsig : 8;
    for (int i = 0; i < n_c1; i++) {
      int g1 = abs_lev[i] > 1;
      cab.encode_bin(KVZ_CTX_COEFF_ABS_LEVEL_GREATER1_FLAG +
                         (c_idx ? 16 : 0) + ctx_set * 4 + c1, g1);
      if (g1) {
        c1 = 0;
        if (first_g1 < 0) first_g1 = i;
      } else if (c1 > 0 && c1 < 3) {
        c1++;
      }
    }
    if (first_g1 >= 0) {
      cab.encode_bin(KVZ_CTX_COEFF_ABS_LEVEL_GREATER2_FLAG +
                         (c_idx ? 4 : 0) + ctx_set,
                     abs_lev[first_g1] > 2);
    }
    int hide = sdh && (sig_pos[0] - sig_pos[nsig - 1] > 3);
    int n_signs = hide ? nsig - 1 : nsig;
    uint32_t sign_pat = 0;
    for (int i = 0; i < n_signs; i++) sign_pat = (sign_pat << 1) | signs[i];
    if (n_signs) cab.encode_bins_ep(sign_pat, n_signs);
    int rice = 0, first_coeff2 = 1;
    for (int i = 0; i < nsig; i++) {
      int base_l = (i < 8) ? (2 + first_coeff2) : 1;
      if (abs_lev[i] >= base_l) {
        cab.golomb_remaining(abs_lev[i] - base_l, rice);
        if (abs_lev[i] > (3 << rice) && rice < 4) rice++;
      }
      if (abs_lev[i] >= 2) first_coeff2 = 0;
    }
  }
}

// per-CTB SAO parameter record (packed by the Python binding)
struct SaoRec {
  int32_t y_typ, y_cls, y_pos, y_off[4];
  int32_t c_typ, c_cls;
  int32_t cb_pos, cb_off[4];
  int32_t cr_pos, cr_off[4];
  bool operator==(const SaoRec& o) const {
    return memcmp(this, &o, sizeof(SaoRec)) == 0;
  }
};

// --------------------------------------------------------------------------
// Inter (P/B) support: motion record + frame state mirroring the Python
// writer/decoder pair (engine/md_inter_writer.py + decoder/decoder.py):
// merge/AMVP candidate derivation runs on the same per-4x4 maps the
// decoder rebuilds, which keeps encoder and decoder motion symmetric by
// construction. Reference parity: kvz_inter_get_merge_cand /
// kvz_inter_get_mv_cand (ref src/inter.c:922-1440) and the PU syntax at
// encode_coding_tree.c:311.

static const int64_t kNoRef = -((int64_t)1 << 30);

struct Motion {
  uint8_t f[2] = {0, 0};
  int32_t mv[2][2] = {{0, 0}, {0, 0}};
  int64_t poc[2] = {kNoRef, kNoRef};
  bool operator==(const Motion& o) const {
    return f[0] == o.f[0] && f[1] == o.f[1] &&
           mv[0][0] == o.mv[0][0] && mv[0][1] == o.mv[0][1] &&
           mv[1][0] == o.mv[1][0] && mv[1][1] == o.mv[1][1] &&
           poc[0] == o.poc[0] && poc[1] == o.poc[1];
  }
};

static inline int clip8i(int64_t v) {
  return v < -128 ? -128 : v > 127 ? 127 : (int)v;
}

struct MdWriter {
  const int32_t *size8, *mode8;
  const int32_t* mode4d;  // per-4x4 PU modes (NxN cells) or null
  const int32_t *ly, *lcb, *lcr;
  int h, w, r8, c8;
  int sdh;
  const SaoRec* sao;  // [R*C] or null
  int sao_cmax;
  int ctb_rows, ctb_cols;
  uint8_t* coded8;    // [r8*c8] written-cell mask
  int8_t* depth8;     // [r8*c8]
  // 4x4-granular coded/mode state: MPM neighbours are PUs, which NxN
  // makes 4x4-granular (mirrors decoder fs.intra_mode/fs.coded)
  uint8_t* coded4;    // [r4*c4]
  int32_t* mode4s;    // [r4*c4]
  Cabac* cab;

  // ---- inter state (P/B slices; null/0 on intra slices) ----
  int slice_type = 2;            // 2 I, 1 P, 0 B
  const uint8_t* inter8 = nullptr;   // [r8*c8]
  const int32_t* mv8 = nullptr;      // [r8*c8*2] (x, y) qpel
  const int32_t* ref8 = nullptr;     // [r8*c8]
  const int32_t* dir8 = nullptr;     // [r8*c8] or null (P path)
  const int32_t* mv8b = nullptr;
  const int32_t* ref8b = nullptr;
  int64_t poc = 0;
  int n_ref0 = 0, n_ref1 = 0, n_union = 0;
  const int64_t* ref_pocs0 = nullptr;
  const int64_t* ref_pocs1 = nullptr;
  const int64_t* union_pocs = nullptr;
  int n_act0 = 1, n_act1 = 1;
  int max_merge = 5;
  int tmvp_enabled = 0, collocated_from_l0 = 1, no_backward = 1;
  int64_t col_poc = 0;
  const int32_t* col_mv = nullptr;     // [r4*c4*2*2]
  const int64_t* col_refpoc = nullptr; // [r4*c4*2]
  // per-4x4 writer frame state (mirrors decoder _FrameState)
  uint8_t* pred4 = nullptr;   // 1 = intra (decoder INTRA), 0 = inter
  uint8_t* skip4 = nullptr;
  int32_t* mv4 = nullptr;     // [r4*c4*2*2]
  int64_t* refpoc4 = nullptr; // [r4*c4*2]

  bool coded_at8(int c8x, int c8y) const {
    if (c8x < 0 || c8y < 0 || c8x >= c8 || c8y >= r8) return false;
    return coded8[c8y * c8 + c8x] != 0;
  }
  // (x, y) in pixels; cur_y = current PU's top pixel row
  int neighbor_mode(int x, int y, int cur_y, bool above) const {
    int c4 = this->c8 * 2, r4 = this->r8 * 2;
    int x4 = x >> 2, y4 = y >> 2;
    if (x4 < 0 || y4 < 0 || x4 >= c4 || y4 >= r4) return 1;  // DC
    if (!coded4[y4 * c4 + x4]) return 1;
    if (above && (y >> 6) != (cur_y >> 6)) return 1;  // other CTB row
    return mode4s[y4 * c4 + x4];
  }
  void mark4(int x0, int y0, int size, int mode) {
    int c4 = this->c8 * 2;
    for (int r = 0; r < (size >> 2); r++)
      for (int c = 0; c < (size >> 2); c++) {
        int i = ((y0 >> 2) + r) * c4 + (x0 >> 2) + c;
        coded4[i] = 1;
        mode4s[i] = mode;
      }
  }

  void write_sao_offsets(const int32_t* off, bool band) {
    for (int i = 0; i < 4; i++) {
      int a = off[i] < 0 ? -off[i] : off[i];
      for (int k = 0; k < a; k++) cab->encode_bin_ep(1);
      if (a < sao_cmax) cab->encode_bin_ep(0);
    }
    if (band)
      for (int i = 0; i < 4; i++)
        if (off[i]) cab->encode_bin_ep(off[i] < 0 ? 1 : 0);
  }

  void write_sao(int cy, int cx, bool left_ok, bool up_ok) {
    const SaoRec& rec = sao[cy * ctb_cols + cx];
    if (left_ok) {
      bool ml = rec == sao[cy * ctb_cols + cx - 1];
      cab->encode_bin(KVZ_CTX_SAO_MERGE_FLAG, ml);
      if (ml) return;
    }
    if (up_ok) {
      bool mu = rec == sao[(cy - 1) * ctb_cols + cx];
      cab->encode_bin(KVZ_CTX_SAO_MERGE_FLAG, mu);
      if (mu) return;
    }
    // luma
    if (rec.y_typ == 0) {
      cab->encode_bin(KVZ_CTX_SAO_TYPE_IDX, 0);
    } else {
      cab->encode_bin(KVZ_CTX_SAO_TYPE_IDX, 1);
      cab->encode_bin_ep(rec.y_typ == 2 ? 1 : 0);
      write_sao_offsets(rec.y_off, rec.y_typ == 1);
      if (rec.y_typ == 1) cab->encode_bins_ep(rec.y_pos, 5);
      else cab->encode_bins_ep(rec.y_cls, 2);
    }
    // chroma (cb + cr share typ/cls)
    if (rec.c_typ == 0) {
      cab->encode_bin(KVZ_CTX_SAO_TYPE_IDX, 0);
    } else {
      cab->encode_bin(KVZ_CTX_SAO_TYPE_IDX, 1);
      cab->encode_bin_ep(rec.c_typ == 2 ? 1 : 0);
      write_sao_offsets(rec.cb_off, rec.c_typ == 1);
      if (rec.c_typ == 1) cab->encode_bins_ep(rec.cb_pos, 5);
      else cab->encode_bins_ep(rec.c_cls, 2);
      write_sao_offsets(rec.cr_off, rec.c_typ == 1);
      if (rec.c_typ == 1) cab->encode_bins_ep(rec.cr_pos, 5);
    }
  }

  int plane_any(const int32_t* p, int stride, int x0, int y0,
                int size) const {
    for (int r = 0; r < size; r++) {
      const int32_t* row = p + (int64_t)(y0 + r) * stride + x0;
      for (int c = 0; c < size; c++) if (row[c]) return 1;
    }
    return 0;
  }

  void tu_leaf(int x0, int y0, int log2, int mode, int depth,
               int parent_cb, int parent_cr) {
    int size = 1 << log2;
    int csize = size >> 1, c_log2 = log2 - 1;
    int cy0 = y0 >> 1, cx0 = x0 >> 1, cw = w >> 1;
    int cbf_y = plane_any(ly, w, x0, y0, size);
    int cbf_cb = parent_cb ? plane_any(lcb, cw, cx0, cy0, csize) : 0;
    int cbf_cr = parent_cr ? plane_any(lcr, cw, cx0, cy0, csize) : 0;
    // chroma cbf ctx = trafoDepth; luma ctx 1 iff trafoDepth 0
    if (parent_cb) cab->encode_bin(KVZ_CTX_CBF_CHROMA + depth, cbf_cb);
    if (parent_cr) cab->encode_bin(KVZ_CTX_CBF_CHROMA + depth, cbf_cr);
    cab->encode_bin(KVZ_CTX_CBF_LUMA + (depth == 0 ? 1 : 0), cbf_y);
    if (cbf_y)
      encode_residual_any(*cab, ly, w, x0, y0, log2, 0,
                          intra_scan_idx(mode, log2, 0), sdh);
    if (cbf_cb)
      encode_residual_any(*cab, lcb, cw, cx0, cy0, c_log2, 1,
                          intra_scan_idx(mode, c_log2, 1), sdh);
    if (cbf_cr)
      encode_residual_any(*cab, lcr, cw, cx0, cy0, c_log2, 2,
                          intra_scan_idx(mode, c_log2, 2), sdh);
  }

  void transform_unit(int x0, int y0, int log2, int mode) {
    if (log2 == 6) {
      // 64x64 CU: forced TU split (spec 7.3.8.8) — chroma cbfs at
      // trafoDepth 0, then four 32x32 TUs in z order
      int cw = w >> 1;
      int cbf_cb = plane_any(lcb, cw, x0 >> 1, y0 >> 1, 32);
      int cbf_cr = plane_any(lcr, cw, x0 >> 1, y0 >> 1, 32);
      cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cb);
      cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cr);
      static const int off[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
      for (int i = 0; i < 4; i++)
        tu_leaf(x0 + off[i][0] * 32, y0 + off[i][1] * 32, 5, mode, 1,
                cbf_cb, cbf_cr);
      return;
    }
    tu_leaf(x0, y0, log2, mode, 0, 1, 1);
  }

  // MPM list (spec 8.4.2): candA left, candB above (other-CTB-row ->
  // DC); (x0, y0) = the PU's top-left pixel
  void mpm_list(int x0, int y0, int mpm[3]) const {
    int a = neighbor_mode(x0 - 1, y0, y0, false);
    int b = neighbor_mode(x0, y0 - 1, y0, true);
    if (a == b) {
      if (a < 2) { mpm[0] = 0; mpm[1] = 1; mpm[2] = 26; }
      else { mpm[0] = a; mpm[1] = 2 + ((a + 29) % 32);
             mpm[2] = 2 + ((a - 1) % 32); }
    } else {
      mpm[0] = a; mpm[1] = b;
      if (a != 0 && b != 0) mpm[2] = 0;
      else if (a + b < 2) mpm[2] = 26;
      else mpm[2] = 1;
    }
  }

  // -> flag; payload goes out via *pay (mpm idx if flag, else rem)
  static int mode_payload(int mode, const int mpm[3], int* pay) {
    for (int i = 0; i < 3; i++)
      if (mpm[i] == mode) { *pay = i; return 1; }
    int rem = mode;
    int s0 = mpm[0], s1 = mpm[1], s2 = mpm[2], t;
    if (s0 > s1) { t = s0; s0 = s1; s1 = t; }
    if (s1 > s2) { t = s1; s1 = s2; s2 = t; }
    if (s0 > s1) { t = s0; s0 = s1; s1 = t; }
    if (rem > s2) rem--;
    if (rem > s1) rem--;
    if (rem > s0) rem--;
    *pay = rem;
    return 0;
  }

  void write_mode_payload(int flag, int pay) {
    if (flag) {
      if (pay == 0) cab->encode_bin_ep(0);
      else { cab->encode_bin_ep(1); cab->encode_bin_ep(pay - 1); }
    } else {
      cab->encode_bins_ep(pay, 5);
    }
  }

  // ---- inter helpers (decoder.py _mv_at/_scale_mv/_col_mv mirrors) ----

  bool coded_at4(int x, int y) const {
    if (x < 0 || y < 0 || x >= w || y >= h) return false;
    return coded4[(y >> 2) * (c8 * 2) + (x >> 2)] != 0;
  }

  // Motion of the 4x4 block at pixel (x, y); valid=false if not z-coded
  // inter (decoder.py _mv_at)
  bool mv_at(int x, int y, Motion* m) const {
    if (!coded_at4(x, y)) return false;
    int i = (y >> 2) * (c8 * 2) + (x >> 2);
    if (pred4[i] != 0) return false;  // intra
    const int64_t* p = refpoc4 + (int64_t)i * 2;
    m->f[0] = p[0] > kNoRef;
    m->f[1] = p[1] > kNoRef;
    m->poc[0] = p[0];
    m->poc[1] = p[1];
    const int32_t* v = mv4 + (int64_t)i * 4;
    m->mv[0][0] = v[0]; m->mv[0][1] = v[1];
    m->mv[1][0] = v[2]; m->mv[1][1] = v[3];
    return true;
  }

  static void scale_mv(const int32_t in[2], int64_t cur_diff,
                       int64_t ref_diff, int32_t out[2]) {
    int tb = clip8i(cur_diff), td = clip8i(ref_diff);
    if (td == tb || td == 0) { out[0] = in[0]; out[1] = in[1]; return; }
    int tx = (16384 + (td < 0 ? -td : td) / 2) / td;
    int64_t dsf = ((int64_t)tb * tx + 32) >> 6;
    if (dsf < -4096) dsf = -4096;
    if (dsf > 4095) dsf = 4095;
    for (int k = 0; k < 2; k++) {
      int64_t prod = dsf * in[k];
      int64_t mag = ((prod < 0 ? -prod : prod) + 127) >> 8;
      int64_t v = prod < 0 ? -mag : prod > 0 ? mag : 0;
      out[k] = v < -32768 ? -32768 : v > 32767 ? 32767 : (int32_t)v;
    }
  }

  // temporal MV for list lx scaled to ref_poc (spec 8.5.3.2.8/9)
  bool col_mv_at(int x, int y, int pw, int ph, int lx, int64_t ref_poc,
                 int32_t out[2]) const {
    if (!col_mv) return false;
    int c4 = c8 * 2;
    int cand_xy[2][2];
    int n = 0;
    int cx = x + pw, cy = y + ph;
    if (cx < w && cy < h && (cy >> 6) == (y >> 6)) {
      cand_xy[n][0] = cx; cand_xy[n][1] = cy; n++;
    }
    cand_xy[n][0] = x + (pw >> 1); cand_xy[n][1] = y + (ph >> 1); n++;
    for (int i = 0; i < n; i++) {
      int pxx = (cand_xy[i][0] >> 4) << 4, pyy = (cand_xy[i][1] >> 4) << 4;
      int64_t idx = (int64_t)(pyy >> 2) * c4 + (pxx >> 2);
      int64_t p0 = col_refpoc[idx * 2], p1 = col_refpoc[idx * 2 + 1];
      bool f0 = p0 > kNoRef, f1 = p1 > kNoRef;
      if (!f0 && !f1) continue;
      int use;
      if (!f0) use = 1;
      else if (!f1) use = 0;
      else if (no_backward) use = lx;
      else use = collocated_from_l0 ? 1 : 0;
      int32_t mv[2] = {col_mv[idx * 4 + use * 2],
                       col_mv[idx * 4 + use * 2 + 1]};
      int64_t col_ref = use ? p1 : p0;
      scale_mv(mv, poc - ref_poc, col_poc - col_ref, out);
      return true;
    }
    return false;
  }

  // merge list (spec 8.5.3.2.3; decoder.py merge_candidates)
  int merge_candidates(int x0, int y0, int pw, int ph,
                       Motion out[5]) const {
    bool is_b = slice_type == 0;
    Motion a1m, b1m, b0m, a0m, b2m;
    bool a1 = mv_at(x0 - 1, y0 + ph - 1, &a1m);
    bool b1 = mv_at(x0 + pw - 1, y0 - 1, &b1m);
    bool b0 = mv_at(x0 + pw, y0 - 1, &b0m);
    bool a0 = mv_at(x0 - 1, y0 + ph, &a0m);
    int n = 0;
    if (a1) out[n++] = a1m;
    if (b1 && !(a1 && b1m == a1m)) out[n++] = b1m;
    if (b0 && !(b1 && b0m == b1m)) out[n++] = b0m;
    if (a0 && !(a1 && a0m == a1m)) out[n++] = a0m;
    if (n < 4) {
      bool b2 = mv_at(x0 - 1, y0 - 1, &b2m);
      if (b2 && !(a1 && b2m == a1m) && !(b1 && b2m == b1m))
        out[n++] = b2m;
    }
    if (tmvp_enabled && n < max_merge) {
      Motion t;
      int32_t tv[2];
      bool f0 = col_mv_at(x0, y0, pw, ph, 0, ref_pocs0[0], tv);
      if (f0) {
        t.f[0] = 1; t.mv[0][0] = tv[0]; t.mv[0][1] = tv[1];
        t.poc[0] = ref_pocs0[0];
      }
      bool f1 = false;
      if (is_b && n_ref1 > 0) {
        f1 = col_mv_at(x0, y0, pw, ph, 1, ref_pocs1[0], tv);
        if (f1) {
          t.f[1] = 1; t.mv[1][0] = tv[0]; t.mv[1][1] = tv[1];
          t.poc[1] = ref_pocs1[0];
        }
      }
      if (f0 || f1) out[n++] = t;
    }
    // combined bi-predictive candidates (spec 8.5.3.2.4)
    if (is_b && n > 1 && n < max_merge) {
      static const int ord[12][2] = {{0, 1}, {1, 0}, {0, 2}, {2, 0},
                                     {1, 2}, {2, 1}, {0, 3}, {3, 0},
                                     {1, 3}, {3, 1}, {2, 3}, {3, 2}};
      int base = n;
      for (int i = 0; i < 12 && n < max_merge; i++) {
        int i0 = ord[i][0], i1 = ord[i][1];
        if (i0 >= base || i1 >= base) continue;
        const Motion &c0 = out[i0], &c1 = out[i1];
        if (!(c0.f[0] && c1.f[1])) continue;
        if (c0.poc[0] == c1.poc[1] && c0.mv[0][0] == c1.mv[1][0] &&
            c0.mv[0][1] == c1.mv[1][1])
          continue;
        Motion t;
        t.f[0] = t.f[1] = 1;
        t.mv[0][0] = c0.mv[0][0]; t.mv[0][1] = c0.mv[0][1];
        t.mv[1][0] = c1.mv[1][0]; t.mv[1][1] = c1.mv[1][1];
        t.poc[0] = c0.poc[0]; t.poc[1] = c1.poc[1];
        out[n++] = t;
      }
    }
    int zi = 0;
    while (n < max_merge) {
      Motion t;
      t.f[0] = 1;
      t.poc[0] = ref_pocs0[zi < n_ref0 ? zi : n_ref0 - 1];
      if (is_b && n_ref1 > 0) {
        t.f[1] = 1;
        t.poc[1] = ref_pocs1[zi < n_ref1 ? zi : n_ref1 - 1];
      }
      out[n++] = t;
      zi++;
    }
    return max_merge < n ? max_merge : n;
  }

  // two AMVP candidates for list lx (spec 8.5.3.2.6)
  void amvp_candidates(int x0, int y0, int pw, int ph, int lx,
                       int64_t ref_poc, int32_t out[2][2]) const {
    Motion a0m, a1m, b0m, b1m, b2m;
    bool a0 = mv_at(x0 - 1, y0 + ph, &a0m);
    bool a1 = mv_at(x0 - 1, y0 + ph - 1, &a1m);
    bool b0 = mv_at(x0 + pw, y0 - 1, &b0m);
    bool b1 = mv_at(x0 + pw - 1, y0 - 1, &b1m);
    bool b2 = mv_at(x0 - 1, y0 - 1, &b2m);
    const Motion* as[2] = {a0 ? &a0m : nullptr, a1 ? &a1m : nullptr};
    const Motion* bs[3] = {b0 ? &b0m : nullptr, b1 ? &b1m : nullptr,
                           b2 ? &b2m : nullptr};

    auto pick_same = [&](const Motion* const* cl, int nc,
                         int32_t o[2]) -> bool {
      for (int i = 0; i < nc; i++) {
        if (!cl[i]) continue;
        int ls[2] = {lx, 1 - lx};
        for (int k = 0; k < 2; k++) {
          int l = ls[k];
          if (cl[i]->f[l] && cl[i]->poc[l] == ref_poc) {
            o[0] = cl[i]->mv[l][0]; o[1] = cl[i]->mv[l][1];
            return true;
          }
        }
      }
      return false;
    };
    auto pick_scaled = [&](const Motion* const* cl, int nc,
                           int32_t o[2]) -> bool {
      for (int i = 0; i < nc; i++) {
        if (!cl[i]) continue;
        int ls[2] = {lx, 1 - lx};
        for (int k = 0; k < 2; k++) {
          int l = ls[k];
          if (cl[i]->f[l]) {
            scale_mv(cl[i]->mv[l], poc - ref_poc, poc - cl[i]->poc[l], o);
            return true;
          }
        }
      }
      return false;
    };

    bool a_avail = a0 || a1;
    int32_t mva[2], mvb[2];
    bool has_a = pick_same(as, 2, mva);
    if (!has_a && a_avail) has_a = pick_scaled(as, 2, mva);
    bool has_b = pick_same(bs, 3, mvb);
    if (!a_avail) {
      // spec 8.5.3.2.7: promote B to the A slot, re-derive B scaled
      has_a = has_b;
      if (has_b) { mva[0] = mvb[0]; mva[1] = mvb[1]; }
      has_b = pick_scaled(bs, 3, mvb);
    }
    int n = 0;
    if (has_a) { out[n][0] = mva[0]; out[n][1] = mva[1]; n++; }
    if (has_b && !(has_a && mvb[0] == mva[0] && mvb[1] == mva[1])) {
      out[n][0] = mvb[0]; out[n][1] = mvb[1]; n++;
    }
    if (n < 2 && tmvp_enabled) {
      int32_t tv[2];
      if (col_mv_at(x0, y0, pw, ph, lx, ref_poc, tv)) {
        out[n][0] = tv[0]; out[n][1] = tv[1]; n++;
      }
    }
    while (n < 2) { out[n][0] = 0; out[n][1] = 0; n++; }
  }

  void mark_inter(int x0, int y0, int pw, int ph, const Motion& m,
                  bool skip) {
    int c4 = c8 * 2;
    for (int r = 0; r < (ph >> 2); r++)
      for (int c = 0; c < (pw >> 2); c++) {
        int64_t i = (int64_t)((y0 >> 2) + r) * c4 + (x0 >> 2) + c;
        pred4[i] = 0;  // inter
        mode4s[i] = 1; // DC for MPM purposes (decoder _mark_inter)
        coded4[i] = 1;
        skip4[i] = skip;
        mv4[i * 4 + 0] = m.mv[0][0]; mv4[i * 4 + 1] = m.mv[0][1];
        mv4[i * 4 + 2] = m.mv[1][0]; mv4[i * 4 + 3] = m.mv[1][1];
        refpoc4[i * 2] = m.f[0] ? m.poc[0] : kNoRef;
        refpoc4[i * 2 + 1] = m.f[1] ? m.poc[1] : kNoRef;
      }
  }

  int skip_ctx(int x0, int y0) const {
    int c4 = c8 * 2;
    int ctx = 0;
    if (coded_at4(x0 - 1, y0) && skip4[(y0 >> 2) * c4 + ((x0 - 1) >> 2)])
      ctx++;
    if (coded_at4(x0, y0 - 1) && skip4[((y0 - 1) >> 2) * c4 + (x0 >> 2)])
      ctx++;
    return ctx;
  }

  void write_merge_idx(int idx) {
    if (max_merge <= 1) return;
    cab->encode_bin(KVZ_CTX_MERGE_IDX, idx > 0);
    if (idx > 0) {
      for (int i = 1; i < idx; i++) cab->encode_bin_ep(1);
      if (idx < max_merge - 1) cab->encode_bin_ep(0);
    }
  }

  void write_mvd(const int32_t mvd[2]) {
    int g0[2] = {mvd[0] != 0, mvd[1] != 0};
    int a0v = mvd[0] < 0 ? -mvd[0] : mvd[0];
    int a1v = mvd[1] < 0 ? -mvd[1] : mvd[1];
    int g1[2] = {a0v > 1, a1v > 1};
    cab->encode_bin(KVZ_CTX_MVD + 0, g0[0]);
    cab->encode_bin(KVZ_CTX_MVD + 0, g0[1]);
    if (g0[0]) cab->encode_bin(KVZ_CTX_MVD + 1, g1[0]);
    if (g0[1]) cab->encode_bin(KVZ_CTX_MVD + 1, g1[1]);
    for (int k = 0; k < 2; k++) {
      if (!g0[k]) continue;
      int a = k ? a1v : a0v;
      if (g1[k]) {
        // abs_mvd_minus2 as 1st-order exp-golomb, bypass
        int val = a - 2, q = 0;
        while (val >= (1 << q) << 1) {
          val -= (1 << q) << 1;
          cab->encode_bin_ep(1);
          q++;
        }
        cab->encode_bin_ep(0);
        cab->encode_bins_ep(val, q + 1);
      }
      cab->encode_bin_ep(mvd[k] < 0);
    }
  }

  void write_ref_idx(int ridx, int n_act) {
    if (n_act <= 1) return;
    cab->encode_bin(KVZ_CTX_REF_IDX + 0, ridx > 0);
    if (ridx > 0 && n_act > 2) {
      cab->encode_bin(KVZ_CTX_REF_IDX + 1, ridx > 1);
      if (ridx > 1) {
        for (int i = 0; i < ridx - 2; i++) cab->encode_bin_ep(1);
        if (ridx < n_act - 1) cab->encode_bin_ep(0);
      }
    }
  }

  // motion of the current CU from the 8-cell decision maps
  // (engine/md_inter_writer.py _motion_at); ridx2 gets per-list indices
  void motion_at(int x0, int y0, Motion* m, int ridx2[2]) const {
    int i8 = (y0 >> 3) * c8 + (x0 >> 3);
    ridx2[0] = ridx2[1] = -1;
    if (dir8) {
      int d = dir8[i8];
      if (d & 1) {
        int r = ref8[i8];
        if (r > n_ref0 - 1) r = n_ref0 - 1;
        ridx2[0] = r;
        m->f[0] = 1;
        m->poc[0] = ref_pocs0[r];
        m->mv[0][0] = mv8[i8 * 2]; m->mv[0][1] = mv8[i8 * 2 + 1];
      }
      if (d & 2) {
        int r = ref8b[i8];
        if (r > n_ref1 - 1) r = n_ref1 - 1;
        ridx2[1] = r;
        m->f[1] = 1;
        m->poc[1] = ref_pocs1[r];
        m->mv[1][0] = mv8b[i8 * 2]; m->mv[1][1] = mv8b[i8 * 2 + 1];
      }
      return;
    }
    int k = ref8[i8];
    if (k > n_union - 1) k = n_union - 1;
    int64_t p = union_pocs[k];
    int lx = -1, ridx = -1;
    for (int i = 0; i < n_ref0; i++)
      if (ref_pocs0[i] == p) { lx = 0; ridx = i; break; }
    if (lx < 0)
      for (int i = 0; i < n_ref1; i++)
        if (ref_pocs1[i] == p) { lx = 1; ridx = i; break; }
    m->f[lx] = 1;
    m->poc[lx] = p;
    m->mv[lx][0] = mv8[i8 * 2]; m->mv[lx][1] = mv8[i8 * 2 + 1];
    ridx2[lx] = ridx;
  }

  void inter_cu(int x0, int y0, int size, int log2) {
    Motion motion;
    int ridx2[2];
    motion_at(x0, y0, &motion, ridx2);
    int cw = w >> 1, cx0 = x0 >> 1, cy0 = y0 >> 1, csize = size >> 1;
    int cbf_y = plane_any(ly, w, x0, y0, size);
    int cbf_cb = plane_any(lcb, cw, cx0, cy0, csize);
    int cbf_cr = plane_any(lcr, cw, cx0, cy0, csize);
    int has_resi = cbf_y || cbf_cb || cbf_cr;
    Motion cands[5];
    int nc = merge_candidates(x0, y0, size, size, cands);
    int merge_idx = -1;
    for (int k = 0; k < nc; k++)
      if (cands[k] == motion) { merge_idx = k; break; }
    int sctx = skip_ctx(x0, y0);
    if (merge_idx >= 0 && !has_resi) {
      cab->encode_bin(KVZ_CTX_CU_SKIP_FLAG + sctx, 1);
      write_merge_idx(merge_idx);
      mark_inter(x0, y0, size, size, motion, true);
      return;
    }
    cab->encode_bin(KVZ_CTX_CU_SKIP_FLAG + sctx, 0);
    cab->encode_bin(KVZ_CTX_PRED_MODE_FLAG, 0);
    cab->encode_bin(KVZ_CTX_PART_MODE, 1);  // 2Nx2N
    if (merge_idx >= 0) {
      cab->encode_bin(KVZ_CTX_MERGE_FLAG, 1);
      write_merge_idx(merge_idx);
    } else {
      cab->encode_bin(KVZ_CTX_MERGE_FLAG, 0);
      if (slice_type == 0) {
        int bi = motion.f[0] && motion.f[1];
        cab->encode_bin(KVZ_CTX_INTER_PRED_IDC + (6 - log2), bi);
        if (!bi)
          cab->encode_bin(KVZ_CTX_INTER_PRED_IDC + 4, motion.f[1] != 0);
      }
      for (int lx = 0; lx < 2; lx++) {
        if (!motion.f[lx]) continue;
        int n_act = lx == 0 ? n_act0 : n_act1;
        write_ref_idx(ridx2[lx], n_act);
        int64_t ref_poc = lx == 0 ? ref_pocs0[ridx2[0]]
                                  : ref_pocs1[ridx2[1]];
        int32_t mvps[2][2];
        amvp_candidates(x0, y0, size, size, lx, ref_poc, mvps);
        int32_t c0 = (motion.mv[lx][0] - mvps[0][0] < 0
                          ? mvps[0][0] - motion.mv[lx][0]
                          : motion.mv[lx][0] - mvps[0][0]) +
                     (motion.mv[lx][1] - mvps[0][1] < 0
                          ? mvps[0][1] - motion.mv[lx][1]
                          : motion.mv[lx][1] - mvps[0][1]);
        int32_t c1 = (motion.mv[lx][0] - mvps[1][0] < 0
                          ? mvps[1][0] - motion.mv[lx][0]
                          : motion.mv[lx][0] - mvps[1][0]) +
                     (motion.mv[lx][1] - mvps[1][1] < 0
                          ? mvps[1][1] - motion.mv[lx][1]
                          : motion.mv[lx][1] - mvps[1][1]);
        int flag = c1 < c0;
        int32_t mvd[2] = {motion.mv[lx][0] - mvps[flag][0],
                          motion.mv[lx][1] - mvps[flag][1]};
        write_mvd(mvd);
        cab->encode_bin(KVZ_CTX_MVP_FLAG, flag);
      }
    }
    mark_inter(x0, y0, size, size, motion, false);
    if (merge_idx < 0)
      cab->encode_bin(KVZ_CTX_RQT_ROOT_CBF, has_resi);
    if (!has_resi) return;
    if (log2 == 6) {
      // forced transform split (spec 7.4.9.8): four 32x32 luma TUs,
      // parent chroma cbfs at depth 0 then per-child at depth 1
      cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cb);
      cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cr);
      static const int off[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
      for (int i = 0; i < 4; i++) {
        int qx = x0 + off[i][0] * 32, qy = y0 + off[i][1] * 32;
        int q_cb = plane_any(lcb, cw, qx >> 1, qy >> 1, 16);
        int q_cr = plane_any(lcr, cw, qx >> 1, qy >> 1, 16);
        int q_y = plane_any(ly, w, qx, qy, 32);
        if (cbf_cb) cab->encode_bin(KVZ_CTX_CBF_CHROMA + 1, q_cb);
        if (cbf_cr) cab->encode_bin(KVZ_CTX_CBF_CHROMA + 1, q_cr);
        cab->encode_bin(KVZ_CTX_CBF_LUMA + 0, q_y);
        if (q_y) encode_residual_any(*cab, ly, w, qx, qy, 5, 0, 0, sdh);
        if (cbf_cb && q_cb)
          encode_residual_any(*cab, lcb, cw, qx >> 1, qy >> 1, 4, 1, 0,
                              sdh);
        if (cbf_cr && q_cr)
          encode_residual_any(*cab, lcr, cw, qx >> 1, qy >> 1, 4, 2, 0,
                              sdh);
      }
      return;
    }
    cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cb);
    cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cr);
    if (cbf_cb || cbf_cr) cab->encode_bin(KVZ_CTX_CBF_LUMA + 1, cbf_y);
    if (cbf_y) encode_residual_any(*cab, ly, w, x0, y0, log2, 0, 0, sdh);
    if (cbf_cb)
      encode_residual_any(*cab, lcb, cw, cx0, cy0, log2 - 1, 1, 0, sdh);
    if (cbf_cr)
      encode_residual_any(*cab, lcr, cw, cx0, cy0, log2 - 1, 2, 0, sdh);
  }

  // intra CU inside a P/B slice (engine/md_inter_writer.py _intra_cu)
  void intra_cu_pb(int x0, int y0, int size, int log2) {
    cab->encode_bin(KVZ_CTX_CU_SKIP_FLAG + skip_ctx(x0, y0), 0);
    cab->encode_bin(KVZ_CTX_PRED_MODE_FLAG, 1);
    if (log2 == 3) cab->encode_bin(KVZ_CTX_PART_MODE, 1);  // 2Nx2N
    int mode = mode8[(y0 >> 3) * c8 + (x0 >> 3)];
    int mpm[3], pay;
    mpm_list(x0, y0, mpm);
    int flag = mode_payload(mode, mpm, &pay);
    cab->encode_bin(KVZ_CTX_PREV_INTRA_LUMA_PRED_FLAG, flag);
    write_mode_payload(flag, pay);
    // mark intra: pred4=1, mode, not-skip, ref_poc = NO_REF
    int c4 = c8 * 2;
    for (int r = 0; r < (size >> 2); r++)
      for (int c = 0; c < (size >> 2); c++) {
        int64_t i = (int64_t)((y0 >> 2) + r) * c4 + (x0 >> 2) + c;
        pred4[i] = 1;
        mode4s[i] = mode;
        coded4[i] = 1;
        skip4[i] = 0;
        refpoc4[i * 2] = kNoRef;
        refpoc4[i * 2 + 1] = kNoRef;
        mv4[i * 4] = mv4[i * 4 + 1] = mv4[i * 4 + 2] = mv4[i * 4 + 3] = 0;
      }
    cab->encode_bin(KVZ_CTX_INTRA_CHROMA_PRED_MODE, 0);
    int cw = w >> 1, cx0 = x0 >> 1, cy0 = y0 >> 1, csize = size >> 1;
    int cbf_y = plane_any(ly, w, x0, y0, size);
    int cbf_cb = plane_any(lcb, cw, cx0, cy0, csize);
    int cbf_cr = plane_any(lcr, cw, cx0, cy0, csize);
    cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cb);
    cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cr);
    cab->encode_bin(KVZ_CTX_CBF_LUMA + 1, cbf_y);
    if (cbf_y)
      encode_residual_any(*cab, ly, w, x0, y0, log2, 0,
                          intra_scan_idx(mode, log2, 0), sdh);
    if (cbf_cb)
      encode_residual_any(*cab, lcb, cw, cx0, cy0, log2 - 1, 1,
                          intra_scan_idx(mode, log2 - 1, 1), sdh);
    if (cbf_cr)
      encode_residual_any(*cab, lcr, cw, cx0, cy0, log2 - 1, 2,
                          intra_scan_idx(mode, log2 - 1, 2), sdh);
  }

  void coding_unit(int x0, int y0, int log2) {
    int x8 = x0 >> 3, y8 = y0 >> 3;
    if (slice_type != 2) {
      int k = 1 << (log2 - 3);
      for (int r = 0; r < k; r++)
        for (int c = 0; c < k; c++)
          coded8[(y8 + r) * c8 + x8 + c] = 1;
      if (inter8[y8 * c8 + x8])
        inter_cu(x0, y0, 1 << log2, log2);
      else
        intra_cu_pb(x0, y0, 1 << log2, log2);
      return;
    }
    bool nxn = log2 == 3 && size8[y8 * c8 + x8] == 4 && mode4d;
    if (log2 == 3)
      cab->encode_bin(KVZ_CTX_PART_MODE, nxn ? 0 : 1);
    int k = 1 << (log2 - 3);
    for (int r = 0; r < k; r++)
      for (int c = 0; c < k; c++)
        coded8[(y8 + r) * c8 + x8 + c] = 1;
    if (nxn) { coding_unit_nxn(x0, y0); return; }
    int mode = mode8[y8 * c8 + x8];
    int mpm[3], pay;
    mpm_list(x0, y0, mpm);
    int flag = mode_payload(mode, mpm, &pay);
    cab->encode_bin(KVZ_CTX_PREV_INTRA_LUMA_PRED_FLAG, flag);
    write_mode_payload(flag, pay);
    mark4(x0, y0, 1 << log2, mode);
    cab->encode_bin(KVZ_CTX_INTRA_CHROMA_PRED_MODE, 0);  // derived mode
    transform_unit(x0, y0, log2, mode);
  }

  // NxN intra CU: four 4x4 PUs with independent modes, forced TU split
  // into four 4x4 DST TUs (IntraSplitFlag, spec 7.3.8.5/7.3.8.8). All
  // prev_intra_luma_pred_flags precede the payloads; MPM lists update
  // progressively so PU i sees PU <i modes (decoder parse order).
  void coding_unit_nxn(int x0, int y0) {
    static const int off[4][2] = {{0, 0}, {4, 0}, {0, 4}, {4, 4}};
    int c4 = c8 * 2;
    int modes[4], flags[4], pays[4];
    for (int i = 0; i < 4; i++) {
      int x = x0 + off[i][0], y = y0 + off[i][1];
      modes[i] = mode4d[(y >> 2) * c4 + (x >> 2)];
      int mpm[3];
      mpm_list(x, y, mpm);
      flags[i] = mode_payload(modes[i], mpm, &pays[i]);
      mark4(x, y, 4, modes[i]);
    }
    for (int i = 0; i < 4; i++)
      cab->encode_bin(KVZ_CTX_PREV_INTRA_LUMA_PRED_FLAG, flags[i]);
    for (int i = 0; i < 4; i++) write_mode_payload(flags[i], pays[i]);
    cab->encode_bin(KVZ_CTX_INTRA_CHROMA_PRED_MODE, 0);
    // transform tree: chroma cbfs at the 8x8 level (ctx trafoDepth 0),
    // four 4x4 luma TUs; the CU's 4x4 chroma TU rides blkIdx 3
    int cw = w >> 1, cx0 = x0 >> 1, cy0 = y0 >> 1;
    int cbf_cb = plane_any(lcb, cw, cx0, cy0, 4);
    int cbf_cr = plane_any(lcr, cw, cx0, cy0, 4);
    cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cb);
    cab->encode_bin(KVZ_CTX_CBF_CHROMA + 0, cbf_cr);
    for (int i = 0; i < 4; i++) {
      int x = x0 + off[i][0], y = y0 + off[i][1];
      int cbf_y = plane_any(ly, w, x, y, 4);
      cab->encode_bin(KVZ_CTX_CBF_LUMA + 0, cbf_y);
      if (cbf_y)
        encode_residual_any(*cab, ly, w, x, y, 2, 0,
                            intra_scan_idx(modes[i], 2, 0), sdh);
      if (i == 3) {
        // chroma scan follows the chroma (DM = PU0) mode
        if (cbf_cb)
          encode_residual_any(*cab, lcb, cw, cx0, cy0, 2, 1,
                              intra_scan_idx(modes[0], 2, 2), sdh);
        if (cbf_cr)
          encode_residual_any(*cab, lcr, cw, cx0, cy0, 2, 2,
                              intra_scan_idx(modes[0], 2, 2), sdh);
      }
    }
  }

  void coding_quadtree(int x0, int y0, int log2, int depth) {
    int size = 1 << log2;
    bool inside = (x0 + size <= w) && (y0 + size <= h);
    int leaf = inside ? size8[(y0 >> 3) * c8 + (x0 >> 3)] : 0;
    if (leaf == 4) leaf = 8;  // NxN cell: a leaf at size 8
    bool split;
    if (inside && log2 > 3) {
      split = size > leaf;
      int ctx = 0;
      int x8 = x0 >> 3, y8 = y0 >> 3;
      if (coded_at8(x8 - 1, y8) && depth8[y8 * c8 + x8 - 1] > depth)
        ctx++;
      if (coded_at8(x8, y8 - 1) && depth8[(y8 - 1) * c8 + x8] > depth)
        ctx++;
      cab->encode_bin(KVZ_CTX_SPLIT_CU_FLAG + ctx, split);
    } else {
      split = (!inside && log2 > 3) || (inside && size > leaf);
    }
    if (split) {
      int half = size >> 1;
      static const int off[4][2] = {{0, 0}, {1, 0}, {0, 1}, {1, 1}};
      for (int i = 0; i < 4; i++) {
        int x = x0 + off[i][0] * half, y = y0 + off[i][1] * half;
        if (x < w && y < h) coding_quadtree(x, y, log2 - 1, depth + 1);
      }
      return;
    }
    int k = size >> 3;
    int x8 = x0 >> 3, y8 = y0 >> 3;
    for (int r = 0; r < k; r++)
      for (int c = 0; c < k; c++)
        depth8[(y8 + r) * c8 + x8 + c] = (int8_t)depth;
    coding_unit(x0, y0, log2);
  }

  void write_ctu(int cy, int cx) {
    if (sao) write_sao(cy, cx, cx > 0, cy > 0);
    coding_quadtree(cx * 64, cy * 64, 6, 0);
  }
};

}  // namespace

extern "C" {

// Rebuild an int32 level plane from the device's sparse pack (MSB-first
// nonzero bitmask + compacted int16 values). Replaces the numpy
// unpackbits + boolean-scatter path on the hot per-frame host loop.
void kvz_tpu_sparse_unpack(const uint8_t* mask, const int16_t* vals,
                           int64_t n, int32_t* out) {
  int64_t vi = 0;
  for (int64_t i = 0; i < n; i += 8) {
    uint8_t m = mask[i >> 3];
    if (!m) {
      for (int b = 0; b < 8; ++b) out[i + b] = 0;
      continue;
    }
    for (int b = 0; b < 8; ++b)
      out[i + b] = (m >> (7 - b)) & 1 ? (int32_t)vals[vi++] : 0;
  }
}

// Quadtree (CTB-64) intra slice data. sao_packed is [R*C*19] int32 (see
// SaoRec) or null. Returns total bytes (-1 on overflow); entry_sizes[r]
// gets per-row substream sizes when wpp.
int64_t kvz_tpu_encode_md_slice(const int32_t* size8, const int32_t* mode8,
                                const int32_t* mode4,
                                const int32_t* ly, const int32_t* lcb,
                                const int32_t* lcr, int h, int w, int qp,
                                int wpp, int sdh,
                                const int32_t* sao_packed, int sao_cmax,
                                uint8_t* out, int64_t out_cap,
                                int64_t* entry_sizes) {
  BitWriter bw{out, out_cap};
  Cabac cab;
  cab.bw = &bw;
  Cabac saved;

  int r8 = h >> 3, c8 = w >> 3;
  int rows = h >> 6, cols = w >> 6;
  uint8_t* coded8 = new uint8_t[r8 * c8]();
  int8_t* depth8 = new int8_t[r8 * c8]();
  uint8_t* coded4 = new uint8_t[r8 * c8 * 4]();
  int32_t* mode4s = new int32_t[r8 * c8 * 4]();
  MdWriter md{size8, mode8, mode4, ly, lcb, lcr, h, w, r8, c8, sdh,
              (const SaoRec*)sao_packed, sao_cmax, rows, cols,
              coded8, depth8, coded4, mode4s, &cab};

  if (!wpp) {
    cab.reset_engine();
    cab.init_contexts(qp);
    for (int r = 0; r < rows; r++)
      for (int c = 0; c < cols; c++) {
        md.write_ctu(r, c);
        cab.encode_bin_trm(r == rows - 1 && c == cols - 1);
      }
    cab.finish();
    bw.align_one();
    if (entry_sizes) entry_sizes[0] = bw.len;
  } else {
    int64_t prev_len = 0;
    for (int r = 0; r < rows; r++) {
      cab.reset_engine();
      if (r == 0 || cols == 1) cab.init_contexts(qp);
      else cab.copy_contexts(saved);
      for (int c = 0; c < cols; c++) {
        md.write_ctu(r, c);
        if (c == 1 && cols > 1) saved.copy_contexts(cab);
        int last = (r == rows - 1 && c == cols - 1);
        cab.encode_bin_trm(last);
        if (c == cols - 1 && !last) cab.encode_bin_trm(1);
      }
      cab.finish();
      bw.align_one();
      if (entry_sizes) entry_sizes[r] = bw.len - prev_len;
      prev_len = bw.len;
    }
  }
  delete[] coded8;
  delete[] coded4;
  delete[] mode4s;
  delete[] depth8;
  return bw.len <= out_cap ? bw.len : -1;
}

// Quadtree P/B slice data (mixed inter/intra CUs at 8..64). Parameters
// arrive in one struct (layout mirrored by ctypes in native/__init__.py).
// Merge/AMVP derivation runs on the same per-4x4 frame state the decoder
// rebuilds; out_mv4/out_refpoc4 return the final motion field for the
// encoder's TMVP snapshot of this frame (api.py _motion_fields).
struct KvzPbParams {
  int32_t h, w, qp, init_type, wpp, sdh, slice_type;
  int32_t sao_cmax, max_merge;
  int32_t n_ref0, n_ref1, n_union, n_act0, n_act1;
  int32_t tmvp_enabled, collocated_from_l0, no_backward;
  int64_t poc, col_poc;
  const int32_t* size8;
  const int32_t* mode8;
  const int32_t* ly;
  const int32_t* lcb;
  const int32_t* lcr;
  const int32_t* sao;      // packed SaoRec or null
  const uint8_t* inter8;
  const int32_t* mv8;      // [r8*c8*2]
  const int32_t* ref8;
  const int32_t* dir8;     // null on the P path
  const int32_t* mv8b;
  const int32_t* ref8b;
  const int64_t* ref_pocs0;
  const int64_t* ref_pocs1;
  const int64_t* union_pocs;
  const int32_t* col_mv;     // [r4*c4*2*2] or null
  const int64_t* col_refpoc; // [r4*c4*2] or null
  int32_t* out_mv4;          // [r4*c4*2*2]
  int64_t* out_refpoc4;      // [r4*c4*2]
  uint8_t* out;
  int64_t out_cap;
  int64_t* entry_sizes;
};

int64_t kvz_tpu_encode_md_slice_pb(const KvzPbParams* p) {
  BitWriter bw{p->out, p->out_cap};
  Cabac cab;
  cab.bw = &bw;
  Cabac saved;

  int r8 = p->h >> 3, c8 = p->w >> 3;
  int rows = p->h >> 6, cols = p->w >> 6;
  int64_t n4 = (int64_t)r8 * c8 * 4;
  uint8_t* coded8 = new uint8_t[r8 * c8]();
  int8_t* depth8 = new int8_t[r8 * c8]();
  uint8_t* coded4 = new uint8_t[n4]();
  int32_t* mode4s = new int32_t[n4]();
  uint8_t* pred4 = new uint8_t[n4]();
  uint8_t* skip4 = new uint8_t[n4]();
  MdWriter md{p->size8, p->mode8, nullptr, p->ly, p->lcb, p->lcr,
              p->h, p->w, r8, c8, p->sdh,
              (const SaoRec*)p->sao, p->sao_cmax, rows, cols,
              coded8, depth8, coded4, mode4s, &cab};
  md.slice_type = p->slice_type;
  md.inter8 = p->inter8;
  md.mv8 = p->mv8;
  md.ref8 = p->ref8;
  md.dir8 = p->dir8;
  md.mv8b = p->mv8b;
  md.ref8b = p->ref8b;
  md.poc = p->poc;
  md.n_ref0 = p->n_ref0;
  md.n_ref1 = p->n_ref1;
  md.n_union = p->n_union;
  md.ref_pocs0 = p->ref_pocs0;
  md.ref_pocs1 = p->ref_pocs1;
  md.union_pocs = p->union_pocs;
  md.n_act0 = p->n_act0;
  md.n_act1 = p->n_act1;
  md.max_merge = p->max_merge;
  md.tmvp_enabled = p->tmvp_enabled;
  md.collocated_from_l0 = p->collocated_from_l0;
  md.no_backward = p->no_backward;
  md.col_poc = p->col_poc;
  md.col_mv = p->col_mv;
  md.col_refpoc = p->col_refpoc;
  md.pred4 = pred4;
  md.skip4 = skip4;
  md.mv4 = p->out_mv4;
  md.refpoc4 = p->out_refpoc4;
  memset(p->out_mv4, 0, n4 * 4 * sizeof(int32_t));
  for (int64_t i = 0; i < n4 * 2; i++) p->out_refpoc4[i] = kNoRef;

  if (!p->wpp) {
    cab.reset_engine();
    cab.init_contexts(p->qp, p->init_type);
    for (int r = 0; r < rows; r++)
      for (int c = 0; c < cols; c++) {
        md.write_ctu(r, c);
        cab.encode_bin_trm(r == rows - 1 && c == cols - 1);
      }
    cab.finish();
    bw.align_one();
    if (p->entry_sizes) p->entry_sizes[0] = bw.len;
  } else {
    int64_t prev_len = 0;
    for (int r = 0; r < rows; r++) {
      cab.reset_engine();
      if (r == 0 || cols == 1) cab.init_contexts(p->qp, p->init_type);
      else cab.copy_contexts(saved);
      for (int c = 0; c < cols; c++) {
        md.write_ctu(r, c);
        if (c == 1 && cols > 1) saved.copy_contexts(cab);
        int last = (r == rows - 1 && c == cols - 1);
        cab.encode_bin_trm(last);
        if (c == cols - 1 && !last) cab.encode_bin_trm(1);
      }
      cab.finish();
      bw.align_one();
      if (p->entry_sizes) p->entry_sizes[r] = bw.len - prev_len;
      prev_len = bw.len;
    }
  }
  delete[] coded8;
  delete[] depth8;
  delete[] coded4;
  delete[] mode4s;
  delete[] pred4;
  delete[] skip4;
  return bw.len <= p->out_cap ? bw.len : -1;
}

// Encode the slice data for a fixed 16x16 grid intra picture.
// Returns total bytes written (or -1 on overflow). With wpp != 0,
// entry_sizes[r] receives each row substream's byte size.
int64_t kvz_tpu_encode_intra_grid(const int32_t* modes, const int32_t* ly,
                                  const int32_t* lcb, const int32_t* lcr,
                                  int rows, int cols, int qp, int wpp,
                                  int sdh,
                                  uint8_t* out, int64_t out_cap,
                                  int64_t* entry_sizes) {
  BitWriter bw{out, out_cap};
  Cabac cab;
  cab.bw = &bw;
  Cabac saved;  // wpp context storage

  if (!wpp) {
    cab.reset_engine();
    cab.init_contexts(qp);
    for (int r = 0; r < rows; r++)
      for (int c = 0; c < cols; c++) {
        encode_ctu(cab, r, c, cols, sdh, modes, ly, lcb, lcr);
        int last = (r == rows - 1 && c == cols - 1);
        cab.encode_bin_trm(last);
      }
    cab.finish();
    bw.align_one();
    if (entry_sizes) entry_sizes[0] = bw.len;
  } else {
    int64_t prev_len = 0;
    for (int r = 0; r < rows; r++) {
      cab.reset_engine();
      if (r == 0 || cols == 1) cab.init_contexts(qp);
      else cab.copy_contexts(saved);
      for (int c = 0; c < cols; c++) {
        encode_ctu(cab, r, c, cols, sdh, modes, ly, lcb, lcr);
        if (c == 1 && cols > 1) saved.copy_contexts(cab);
        int last = (r == rows - 1 && c == cols - 1);
        cab.encode_bin_trm(last);
        if (c == cols - 1 && !last) cab.encode_bin_trm(1);
      }
      cab.finish();
      bw.align_one();
      if (entry_sizes) entry_sizes[r] = bw.len - prev_len;
      prev_len = bw.len;
    }
  }
  return bw.len <= out_cap ? bw.len : -1;
}

}  // extern "C"
