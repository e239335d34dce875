// sea_decoder.mjs — standalone JavaScript decoder for the .sea format.
//
// Clean-room implementation from the format semantics (see FORMAT.md in the
// repository root). Decodes both CBR and VBR streams, any channel count.
// This is the browser-demo analog of the reference project's WASM decoder:
// the TPU framework's compute path obviously cannot run in a browser, so the
// demo ships a small pure-JS decoder instead (~220 lines, no dependencies).

const LMS_LEN = 4;

function clampI16(v) {
  return v > 32767 ? 32767 : v < -32768 ? -32768 : v;
}

// --- tables -----------------------------------------------------------------

const IDEAL_POW_FACTOR = [12.0, 11.65, 11.2, 10.58, 9.64, 8.75, 7.66, 6.63];

function buildDqt(sfb, rb) {
  // float32-exact table construction (Math.fround at every step)
  const f = Math.fround;
  const nSf = 1 << sfb;
  const steps = 1 << (rb - 1);
  const pf = f(f(IDEAL_POW_FACTOR[rb - 1]) / f(sfb)); // both operands f32 first
  const scaleFactors = new Int32Array(nSf);
  for (let i = 1; i <= nSf; i++) scaleFactors[i - 1] = Math.trunc(f(Math.pow(i, pf)));
  const curve = new Float32Array(steps);
  if (rb === 1) {
    curve[0] = 2.0;
  } else if (rb === 2) {
    curve[0] = f(1.115);
    curve[1] = 4.0;
  } else {
    const start = 0.75;
    const end = (1 << rb) - 1;
    const stepf = Math.floor(f(f(end - start) / f(steps - 1)));
    for (let i = 1; i < steps; i++) curve[i] = f(0.5 + f(i * stepf));
    curve[0] = start;
    curve[steps - 1] = end;
  }
  const dqt = new Int32Array(nSf * 2 * steps);
  for (let s = 0; s < nSf; s++) {
    for (let k = 0; k < steps; k++) {
      const v = Math.round(f(scaleFactors[s] * curve[k]));
      dqt[s * 2 * steps + 2 * k] = v;
      dqt[s * 2 * steps + 2 * k + 1] = -v;
    }
  }
  return { dqt, columns: 2 * steps };
}

// --- bit reader -------------------------------------------------------------

class BitReader {
  constructor(bytes) {
    this.bytes = bytes;
    this.pos = 0;
    this.carry = 0;
    this.stored = 0;
  }
  next(bits) {
    while (this.stored < bits) {
      if (this.pos >= this.bytes.length) throw new Error("truncated bitstream");
      this.carry = ((this.carry << 8) | this.bytes[this.pos++]) >>> 0;
      this.stored += 8;
    }
    const v = (this.carry >>> (this.stored - bits)) & ((1 << bits) - 1);
    this.stored -= bits;
    this.carry &= (1 << this.stored) - 1;
    return v;
  }
}

// --- decoder ----------------------------------------------------------------

export function seaDecode(buffer) {
  const data = new Uint8Array(buffer);
  const dv = new DataView(data.buffer, data.byteOffset, data.byteLength);
  if (data.length < 22 || String.fromCharCode(...data.slice(0, 4)) !== "seac")
    throw new Error("not a .sea file");
  if (data[4] !== 1) throw new Error("unsupported version");
  const channels = data[5];
  const chunkSize = dv.getUint16(6, true);
  const framesPerChunk = dv.getUint16(8, true);
  const sampleRate = dv.getUint32(10, true);
  let totalFrames = dv.getUint32(14, true);
  const metadataLen = dv.getUint32(18, true);
  // same header validation as the reference parser (src/codec/file.rs:33-38)
  if (channels === 0 || chunkSize < 16 || framesPerChunk === 0 || sampleRate === 0)
    throw new Error("invalid header fields");
  let pos = 22;
  if (pos + metadataLen > data.length) throw new Error("truncated metadata");
  const metadata = new TextDecoder().decode(data.slice(pos, pos + metadataLen));
  pos += metadataLen;

  if (totalFrames === 0) {
    // streaming mode: only whole chunk_size blocks are decodable (a trailing
    // partial chunk cannot be sized without total_frames, chunk.rs:76-79)
    totalFrames = Math.floor((data.length - pos) / chunkSize) * framesPerChunk;
  }
  const out = new Int16Array(totalFrames * channels);
  const dqtCache = new Map();

  let framesDone = 0;
  while (framesDone < totalFrames && pos < data.length) {
    const c = data.subarray(pos, Math.min(pos + chunkSize, data.length));
    const nFrames = Math.min(framesPerChunk, totalFrames - framesDone);
    if (c.length < 4 + channels * 16) throw new Error("truncated chunk");
    const chunkType = c[0];
    const sfb = c[1] >> 4;
    const residualSize = c[1] & 0x0f;
    const sff = c[2];
    if (
      (chunkType !== 1 && chunkType !== 2) ||
      sfb < 1 || sfb > 8 ||
      residualSize < 1 || residualSize > 8 ||
      sff === 0
    )
      throw new Error("bad chunk");
    let cpos = 4;
    // per-channel LMS entry state
    const hist = new Int32Array(channels * LMS_LEN);
    const wts = new Int32Array(channels * LMS_LEN);
    for (let ch = 0; ch < channels; ch++) {
      for (let i = 0; i < LMS_LEN; i++) {
        hist[ch * LMS_LEN + i] = (c[cpos] | (c[cpos + 1] << 8)) << 16 >> 16;
        cpos += 2;
      }
      for (let i = 0; i < LMS_LEN; i++) {
        wts[ch * LMS_LEN + i] = (c[cpos] | (c[cpos + 1] << 8)) << 16 >> 16;
        cpos += 2;
      }
    }
    const nWindows = Math.ceil(nFrames / sff);
    const sfItems = nWindows * channels;
    const sfBytes = Math.ceil((sfItems * sfb) / 8);
    const sf = new Uint8Array(sfItems);
    {
      const r = new BitReader(c.subarray(cpos, cpos + sfBytes));
      for (let i = 0; i < sfItems; i++) sf[i] = r.next(sfb);
      cpos += sfBytes;
    }
    let sizes = null;
    if (chunkType === 2) {
      const vb = Math.ceil((sfItems * 2) / 8);
      sizes = new Uint8Array(sfItems);
      const r = new BitReader(c.subarray(cpos, cpos + vb));
      for (let i = 0; i < sfItems; i++) {
        sizes[i] = r.next(2) + residualSize - 1;
        if (sizes[i] < 1 || sizes[i] > 8) throw new Error("bad vbr residual size");
      }
      cpos += vb;
    }
    for (let rb = 1; rb <= 8; rb++) {
      const key = sfb * 16 + rb;
      if (!dqtCache.has(key)) dqtCache.set(key, buildDqt(sfb, rb));
    }
    const r = new BitReader(c.subarray(cpos));
    for (let f = 0; f < nFrames; f++) {
      const w = Math.floor(f / sff);
      for (let ch = 0; ch < channels; ch++) {
        const rs = chunkType === 2 ? sizes[w * channels + ch] : residualSize;
        const q = r.next(rs);
        // predict: wrapping i32 dot of weights x history, >> 13
        let pred = 0;
        for (let i = 0; i < LMS_LEN; i++)
          pred = (pred + Math.imul(wts[ch * LMS_LEN + i], hist[ch * LMS_LEN + i])) | 0;
        pred >>= 13;
        const t = dqtCache.get(sfb * 16 + rs);
        const dq = t.dqt[sf[w * channels + ch] * t.columns + q];
        const recon = clampI16((pred + dq) | 0);
        out[(framesDone + f) * channels + ch] = recon;
        // LMS update
        const delta = dq >> 4;
        for (let i = 0; i < LMS_LEN; i++)
          wts[ch * LMS_LEN + i] =
            (wts[ch * LMS_LEN + i] + (hist[ch * LMS_LEN + i] < 0 ? -delta : delta)) | 0;
        for (let i = 0; i < LMS_LEN - 1; i++)
          hist[ch * LMS_LEN + i] = hist[ch * LMS_LEN + i + 1];
        hist[ch * LMS_LEN + LMS_LEN - 1] = recon;
      }
    }
    framesDone += nFrames;
    pos += chunkSize;
  }
  return { samples: out, sampleRate, channels, metadata };
}
