// sea_encoder.mjs — standalone JavaScript encoder for the .sea format.
//
// Clean-room implementation from the format semantics (FORMAT.md in the
// repository root; reference behavior: src/codec/encoder_base.rs,
// encoder_cbr.rs, encoder_vbr.rs, chunk.rs, file.rs). CBR output is
// byte-identical to the Python/TPU encoder (which is byte-identical to the
// independent C++ codec and validated against the upstream C decoder); VBR
// follows the same documented conventions (stable tie-break, delta-anchor
// fix, size clamp 1..8).
//
// Exactness notes: all table math and the VBR bitrate arithmetic are f32
// (Math.fround at every step); LMS math is wrapping int32 (Math.imul, |0);
// ranks are 64-bit — accumulated in doubles on the fast path (exact while
// the weight penalty is zero and values stay far below 2^53) with a BigInt
// fallback for weight blow-ups.

const LMS_LEN = 4;
const IDEAL_POW_FACTOR = [12.0, 11.65, 11.2, 10.58, 9.64, 8.75, 7.66, 6.63];
const TARGET_RESIDUAL_DISTRIBUTION = [0.0, 0.0, 0.95, 0.05, 0.0, 0.0];
const f = Math.fround;

function clampI16(v) {
  return v > 32767 ? 32767 : v < -32768 ? -32768 : v;
}

// --- tables ------------------------------------------------------------------

function truncI32(x) {
  if (Number.isNaN(x)) return 0;
  if (x <= -2147483648) return -2147483648;
  if (x >= 2147483647) return 2147483647;
  return Math.trunc(x);
}

function roundHalfAwayF32(x) {
  return x >= 0 ? Math.floor(f(x + 0.5)) : Math.ceil(f(x - 0.5));
}

// zig-zag quant table for one residual size (items = 2^(rs+1) + 1)
function fillZigzag(items) {
  const t = new Uint8Array(items);
  const mid = items >> 1;
  let x = mid - 1;
  t[0] = x & 0xff;
  for (let i = 1; i < mid; i += 2) {
    t[i] = x & 0xff;
    if (i + 1 < items) t[i + 1] = x & 0xff;
    x -= 2;
  }
  x = 0;
  for (let i = mid; i < items - 1; i += 2) {
    t[i] = x & 0xff;
    if (i + 1 < items) t[i + 1] = x & 0xff;
    x += 2;
  }
  t[items - 1] = (x - 2) & 0xff;
  if (items === 9) {
    t[2] = 1;
    t[6] = 0;
  }
  return t;
}

const tableCache = new Map();

// per-(sfb, rs) tables: scale factors, reciprocals, dqt, quant
export function getTables(sfb, rb) {
  const key = sfb * 16 + rb;
  if (tableCache.has(key)) return tableCache.get(key);
  const nSf = 1 << sfb;
  const pf = f(f(IDEAL_POW_FACTOR[rb - 1]) / f(sfb)); // both operands f32 first
  const scaleFactors = new Int32Array(nSf);
  for (let i = 1; i <= nSf; i++) scaleFactors[i - 1] = truncI32(f(Math.pow(i, pf)));
  const reciprocals = new Int32Array(nSf);
  for (let i = 0; i < nSf; i++) reciprocals[i] = truncI32(f(65536 / f(scaleFactors[i])));
  // dequant curve
  const steps = 1 << (rb - 1);
  const curve = new Float32Array(steps);
  if (rb === 1) curve[0] = 2.0;
  else if (rb === 2) {
    curve[0] = f(1.115);
    curve[1] = 4.0;
  } else {
    const stepf = Math.floor(f(f((1 << rb) - 1 - 0.75) / f(steps - 1)));
    for (let i = 1; i < steps; i++) curve[i] = f(0.5 + f(i * stepf));
    curve[0] = 0.75;
    curve[steps - 1] = (1 << rb) - 1;
  }
  const columns = 2 * steps;
  const dqt = new Int32Array(nSf * columns);
  for (let s = 0; s < nSf; s++)
    for (let k = 0; k < steps; k++) {
      const v = truncI32(roundHalfAwayF32(f(scaleFactors[s] * curve[k])));
      dqt[s * columns + 2 * k] = v;
      dqt[s * columns + 2 * k + 1] = -v;
    }
  const quant = fillZigzag((1 << (rb + 1)) + 1); // index: climit + clamped
  const out = { scaleFactors, reciprocals, dqt, columns, quant, climit: 1 << rb };
  tableCache.set(key, out);
  return out;
}

// --- bit writer ----------------------------------------------------------------

class BitWriter {
  constructor() {
    this.bytes = [];
    this.carry = 0;
    this.stored = 0;
  }
  push(value, bits) {
    this.carry = ((this.carry << bits) | (value & ((1 << bits) - 1))) >>> 0;
    this.stored += bits;
    while (this.stored >= 8) {
      this.bytes.push((this.carry >>> (this.stored - 8)) & 0xff);
      this.stored -= 8;
      this.carry &= (1 << this.stored) - 1;
    }
  }
  finish() {
    if (this.stored > 0) {
      this.bytes.push((this.carry << (8 - this.stored)) & 0xff); // left-aligned
      this.stored = 0;
      this.carry = 0;
    }
    return Uint8Array.from(this.bytes);
  }
}

// --- encoder core ------------------------------------------------------------

// fixed-point round-half-away division (encoder_base.rs:22-26); |v| < 2^19,
// recip <= 2^16 — v*recip fits a double exactly
function seaDiv(v, recip) {
  const n = Math.floor((v * recip + 32768) / 65536);
  return n + (Math.sign(v) - Math.sign(n));
}

function weightsPenaltyBig(w) {
  let s = 0n;
  for (let i = 0; i < LMS_LEN; i++) s += BigInt(w[i]) * BigInt(w[i]);
  s = BigInt.asIntN(64, s);
  let p = (s >> 18n) - 0x8ffn;
  if (p < 0n) p = 0n;
  return BigInt.asUintN(64, p * p);
}

// Run the scale-factor search over the windows of one channel's samples.
// state: {hist Int32Array(4), wts Int32Array(4), prevSf} mutated in place --
// windows chain the winner's LMS and prevSf (encoder_base.rs:180-185); the
// VBR analyze pass restores LMS at *chunk* granularity in the caller
// (encoder_vbr.rs:168 restores only lms, keeping prev_scalefactor).
// Emits per-window best scale factor + codes; returns ranks (for VBR pass 1).
function searchChannel(samples, offset, stride, nFrames, sff, sfb, rsPerWindow, state, outSf, outCodes) {
  const nSf = 1 << sfb;
  const nWindows = Math.ceil(nFrames / sff);
  const ranks = new Array(nWindows);
  const savedH = new Int32Array(LMS_LEN);
  const savedW = new Int32Array(LMS_LEN);
  const candH = new Int32Array(LMS_LEN);
  const candW = new Int32Array(LMS_LEN);
  const bestH = new Int32Array(LMS_LEN);
  const bestW = new Int32Array(LMS_LEN);
  const codes = new Uint8Array(sff);
  const bestCodes = new Uint8Array(sff);

  for (let w = 0; w < nWindows; w++) {
    const rb = rsPerWindow[w];
    const t = getTables(sfb, rb);
    const wStart = w * sff;
    const wLen = Math.min(sff, nFrames - wStart);
    savedH.set(state.hist);
    savedW.set(state.wts);
    let bestRank = null; // BigInt
    let bestSf = 0;
    for (let si = 0; si < nSf; si++) {
      const sfi = (state.prevSf + si) % nSf;
      const recip = t.reciprocals[sfi];
      candH.set(savedH);
      candW.set(savedW);
      let rankNum = 0; // double fast path (exact while penalties are 0)
      let rankBig = null; // BigInt once a penalty fires
      for (let k = 0; k < wLen; k++) {
        const sample = samples[offset + (wStart + k) * stride];
        let pred = 0;
        for (let i = 0; i < LMS_LEN; i++) pred = (pred + Math.imul(candW[i], candH[i])) | 0;
        pred >>= 13;
        const residual = sample - pred;
        let scaled = seaDiv(residual, recip);
        if (scaled < -t.climit) scaled = -t.climit;
        else if (scaled > t.climit) scaled = t.climit;
        const q = t.quant[t.climit + scaled];
        const dq = t.dqt[sfi * t.columns + q];
        const recon = clampI16((pred + dq) | 0);
        const err = sample - recon;
        const errSq = err * err;
        // weight penalty: zero unless Σw² >> 18 exceeds 0x8ff (lms.rs:53-62)
        let penaltyBig = null;
        const aw0 = Math.abs(candW[0]), aw1 = Math.abs(candW[1]),
              aw2 = Math.abs(candW[2]), aw3 = Math.abs(candW[3]);
        if (aw0 < 1048576 && aw1 < 1048576 && aw2 < 1048576 && aw3 < 1048576) {
          const s2 = aw0 * aw0 + aw1 * aw1 + aw2 * aw2 + aw3 * aw3; // < 2^42 exact
          const p = Math.floor(s2 / 262144) - 0x8ff;
          if (p > 0) penaltyBig = BigInt(p) * BigInt(p);
        } else {
          penaltyBig = weightsPenaltyBig(candW);
          if (penaltyBig === 0n) penaltyBig = null;
        }
        if (penaltyBig !== null && rankBig === null) rankBig = BigInt(rankNum);
        if (rankBig !== null) {
          rankBig = BigInt.asUintN(64, rankBig + BigInt(errSq) + (penaltyBig ?? 0n));
        } else {
          rankNum += errSq; // <= 255 * 2^34 — far below 2^53, exact
        }
        codes[k] = q;
        // LMS update (lms.rs:43-51)
        const delta = dq >> 4;
        for (let i = 0; i < LMS_LEN; i++)
          candW[i] = (candW[i] + (candH[i] < 0 ? -delta : delta)) | 0;
        candH[0] = candH[1];
        candH[1] = candH[2];
        candH[2] = candH[3];
        candH[3] = recon;
      }
      const rank = rankBig !== null ? rankBig : BigInt(rankNum);
      if (bestRank === null || rank < bestRank) { // strict improvement in rotated order
        bestRank = rank;
        bestSf = sfi;
        bestH.set(candH);
        bestW.set(candW);
        bestCodes.set(codes.subarray(0, wLen));
      }
    }
    ranks[w] = bestRank;
    state.prevSf = bestSf;
    state.hist.set(bestH);
    state.wts.set(bestW);
    if (outSf) outSf[w] = bestSf;
    if (outCodes) for (let k = 0; k < wLen; k++) outCodes[wStart + k] = bestCodes[k];
  }
  return ranks;
}

// --- VBR bitrate math (f32-exact, encoder_vbr.rs:40-137) ----------------------

export function normalizedVbrBitrate(residualBits, fpc, sfb, sff) {
  const d = TARGET_RESIDUAL_DISTRIBUTION.map(f);
  let vbr = f(residualBits);
  vbr = f(vbr - f(f(f(LMS_LEN) * 16.0 * 2.0) / f(fpc)));
  vbr = f(vbr - f(f(sfb) / f(sff)));
  vbr = f(vbr - f(2.0 / f(sff)));
  const base = f(Math.floor(f(residualBits)));
  const nb = f(
    f(f(d[1] * f(base - 1.0)) + f(d[2] * base)) +
      f(f(d[3] * f(base + 1.0)) + f(d[4] * f(base + 2.0)))
  );
  return f(vbr - f(nb - base));
}

export function vbrBase(target) {
  const t = Math.trunc(target);
  return t < 0 ? 0 : t > 255 ? 255 : t;
}

export function interpolateDistribution(items, targetRate) {
  const d = TARGET_RESIDUAL_DISTRIBUTION.map(f);
  const frac = f(targetRate - Math.trunc(targetRate));
  const om = f(1.0 - frac);
  const pct = [0, 1, 2, 3].map((i) => f(f(d[i] * frac) + f(d[i + 1] * om)));
  const res = [0, 0, 0, 0];
  let total = 0;
  while (total < items) {
    const remaining = items - total;
    for (let i = 0; i < 4; i++) {
      const value = Math.trunc(f(f(remaining) * pct[i]));
      total += value;
      res[i] += value;
    }
    if (items - total === remaining) {
      total += remaining;
      res[1] += remaining;
    }
  }
  return res;
}

// --- chunk + file serialization ------------------------------------------------

function serializeChunk(chunkType, sfb, sff, residualSize, lmsStates, sf, sizes, codes, nFrames, channels) {
  const out = [chunkType, ((sfb << 4) | residualSize) & 0xff, sff & 0xff, 0x5a];
  for (let ch = 0; ch < channels; ch++) {
    const st = lmsStates[ch];
    for (let i = 0; i < LMS_LEN; i++) out.push(st.hist[i] & 0xff, (st.hist[i] >> 8) & 0xff);
    for (let i = 0; i < LMS_LEN; i++) out.push(st.wts[i] & 0xff, (st.wts[i] >> 8) & 0xff);
  }
  const bw = new BitWriter();
  for (const v of sf) bw.push(v, sfb);
  out.push(...bw.finish());
  if (chunkType === 2) {
    const dw = new BitWriter();
    for (const s of sizes) dw.push(s - residualSize + 1, 2);
    out.push(...dw.finish());
  }
  const nWindows = Math.ceil(nFrames / sff);
  const rw = new BitWriter();
  for (let k = 0; k < nFrames; k++) {
    const w = Math.min(Math.floor(k / sff), nWindows - 1);
    for (let ch = 0; ch < channels; ch++) {
      const width = chunkType === 2 ? sizes[w * channels + ch] : residualSize;
      rw.push(codes[ch][k], width);
    }
  }
  out.push(...rw.finish());
  return Uint8Array.from(out);
}

// --- public API ----------------------------------------------------------------

// samples: Int16Array (interleaved), settings: {scaleFactorBits=4,
// scaleFactorFrames=20, residualBits=3.0, framesPerChunk=5120, vbr=false,
// metadata=""}. Returns Uint8Array of .sea bytes.
export function seaEncode(samples, sampleRate, channels, settings = {}) {
  const sfb = settings.scaleFactorBits ?? 4;
  const sff = settings.scaleFactorFrames ?? 20;
  const residualBits = settings.residualBits ?? 3.0;
  const fpc = settings.framesPerChunk ?? 5120;
  const vbr = settings.vbr ?? false;
  const metadata = new TextEncoder().encode(settings.metadata ?? "");
  if (channels < 1 || channels > 255) throw new Error("channels must be 1..=255");
  if (fpc <= 0 || sff <= 0 || fpc % sff !== 0)
    throw new Error("scale_factor_frames must divide frames_per_chunk");
  if (sfb < 1 || sfb > 8 || residualBits < 1 || residualBits > 8)
    throw new Error("invalid bit settings");

  const totalFrames = Math.floor(samples.length / channels);
  let residualSize = Math.floor(residualBits);
  let vbrTarget = 0;
  if (vbr) {
    vbrTarget = normalizedVbrBitrate(residualBits, fpc, sfb, sff);
    // delta anchor: min(floor(residual_bits), base+1) — the reference always
    // writes floor() and silently corrupts high-overhead configs (chunk.rs:60)
    residualSize = Math.min(residualSize, vbrBase(vbrTarget) + 1);
  }

  const states = [];
  for (let ch = 0; ch < channels; ch++)
    states.push({
      hist: new Int32Array(LMS_LEN),
      wts: Int32Array.from([0, 0, -(1 << 13), 1 << 14]),
      prevSf: 0,
    });

  const chunks = [];
  for (let start = 0; start < totalFrames; start += fpc) {
    const nFrames = Math.min(fpc, totalFrames - start);
    const nWindows = Math.ceil(nFrames / sff);
    // snapshot entry LMS (truncated to i16 exactly like serialization)
    const entry = states.map((s) => ({
      hist: Int32Array.from(s.hist, (v) => (v << 16) >> 16),
      wts: Int32Array.from(s.wts, (v) => (v << 16) >> 16),
    }));
    const sf = new Uint8Array(nWindows * channels);
    const codes = [];
    let sizes = null;
    if (vbr) {
      const base = vbrBase(vbrTarget);
      // pass 1: analyze at base+1; LMS restored, prevSf kept
      const rs1 = new Int32Array(nWindows).fill(base + 1);
      const errors = new Array(nWindows * channels);
      for (let ch = 0; ch < channels; ch++) {
        const savedH = Int32Array.from(states[ch].hist);
        const savedW = Int32Array.from(states[ch].wts);
        const ranks = searchChannel(
          samples, start * channels + ch, channels, nFrames, sff, sfb, rs1,
          states[ch], null, null
        );
        // restore LMS to chunk entry; keep the advanced prevSf
        states[ch].hist.set(savedH);
        states[ch].wts.set(savedW);
        for (let w = 0; w < nWindows; w++) errors[w * channels + ch] = ranks[w];
      }
      // choose sizes from the error ranking (stable sort; encoder_vbr.rs:98-137)
      const sortable = Math.floor((nFrames * channels) / sff);
      const order = Array.from({ length: sortable }, (_, i) => i).sort((a, b) =>
        errors[a] < errors[b] ? -1 : errors[a] > errors[b] ? 1 : a - b
      );
      const [m1, , p1, p2] = interpolateDistribution(sortable, vbrTarget);
      sizes = new Int16Array(nWindows * channels).fill(base); // signed: base-1 may be -1 pre-clamp
      for (let i = 0; i < m1; i++) sizes[order[i]] = base - 1;
      for (let i = sortable - p2 - p1; i < sortable - p2; i++) sizes[order[i]] = base + 1;
      for (let i = sortable - p2; i < sortable; i++) sizes[order[i]] = base + 2;
      for (let i = 0; i < sizes.length; i++) sizes[i] = Math.min(8, Math.max(1, sizes[i]));
      // pass 2 per channel with per-window sizes
      for (let ch = 0; ch < channels; ch++) {
        const rs2 = new Int32Array(nWindows);
        for (let w = 0; w < nWindows; w++) rs2[w] = sizes[w * channels + ch];
        const sfCh = new Uint8Array(nWindows);
        const codesCh = new Uint8Array(nFrames);
        searchChannel(
          samples, start * channels + ch, channels, nFrames, sff, sfb, rs2,
          states[ch], sfCh, codesCh
        );
        for (let w = 0; w < nWindows; w++) sf[w * channels + ch] = sfCh[w];
        codes.push(codesCh);
      }
    } else {
      const rs = new Int32Array(nWindows).fill(residualSize);
      for (let ch = 0; ch < channels; ch++) {
        const sfCh = new Uint8Array(nWindows);
        const codesCh = new Uint8Array(nFrames);
        searchChannel(
          samples, start * channels + ch, channels, nFrames, sff, sfb, rs,
          states[ch], sfCh, codesCh
        );
        for (let w = 0; w < nWindows; w++) sf[w * channels + ch] = sfCh[w];
        codes.push(codesCh);
      }
    }
    chunks.push(
      serializeChunk(vbr ? 2 : 1, sfb, sff, residualSize, entry, sf, sizes, codes, nFrames, channels)
    );
  }

  const chunkSize = chunks.length ? chunks[0].length : 0;
  if (chunkSize > 0xffff) throw new Error("chunk exceeds the u16 chunk_size field");
  const bodyLen = chunks.reduce((a, c) => a + c.length, 0);
  const out = new Uint8Array(22 + metadata.length + bodyLen);
  const dv = new DataView(out.buffer);
  out.set([0x73, 0x65, 0x61, 0x63, 1, channels]); // 'seac', version, channels
  dv.setUint16(6, chunkSize, true);
  dv.setUint16(8, fpc, true);
  dv.setUint32(10, sampleRate, true);
  dv.setUint32(14, totalFrames, true);
  dv.setUint32(18, metadata.length, true);
  out.set(metadata, 22);
  let pos = 22 + metadata.length;
  for (const c of chunks) {
    out.set(c, pos);
    pos += c.length;
  }
  return out;
}
