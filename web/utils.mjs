// utils.mjs — WAV encode, sample conversion, and quality metrics for the demo.
// Demo analog of the reference web utilities (PSNR, difference signal, WAV
// writer); float->i16 uses the same asymmetric x0x8000 / clamp-0x7fff
// convention the reference's converter uses.

export function floatToInt16(channels) {
  // channels: array of Float32Array (one per channel) -> interleaved Int16Array
  const n = channels[0].length;
  const c = channels.length;
  const out = new Int16Array(n * c);
  for (let i = 0; i < n; i++)
    for (let ch = 0; ch < c; ch++) {
      let v = Math.round(channels[ch][i] * 0x8000);
      if (v > 0x7fff) v = 0x7fff;
      else if (v < -0x8000) v = -0x8000;
      out[i * c + ch] = v;
    }
  return out;
}

export function encodeWav(samples, channels, sampleRate) {
  // 16-bit PCM RIFF (interleaved Int16Array input)
  const dataLen = samples.length * 2;
  const buf = new ArrayBuffer(44 + dataLen);
  const dv = new DataView(buf);
  const str = (o, s) => { for (let i = 0; i < s.length; i++) dv.setUint8(o + i, s.charCodeAt(i)); };
  str(0, "RIFF");
  dv.setUint32(4, 36 + dataLen, true);
  str(8, "WAVE");
  str(12, "fmt ");
  dv.setUint32(16, 16, true);
  dv.setUint16(20, 1, true);
  dv.setUint16(22, channels, true);
  dv.setUint32(24, sampleRate, true);
  dv.setUint32(28, sampleRate * channels * 2, true);
  dv.setUint16(32, channels * 2, true);
  dv.setUint16(34, 16, true);
  str(36, "data");
  dv.setUint32(40, dataLen, true);
  new Int16Array(buf, 44).set(samples);
  return new Uint8Array(buf);
}

export function psnr(a, b) {
  // negative dB, lower is better (reference tests/helpers.rs:101-116)
  const n = Math.min(a.length, b.length);
  if (!n) return 0;
  let acc = 0;
  for (let i = 0; i < n; i++) {
    const d = (a[i] - b[i]) / 32767;
    acc += d * d;
  }
  const rms = Math.sqrt(acc / n);
  return -20 * Math.log10(2 / rms);
}

export function differenceSignal(a, b) {
  const n = Math.min(a.length, b.length);
  const out = new Int16Array(n);
  for (let i = 0; i < n; i++) {
    let v = a[i] - b[i];
    if (v > 32767) v = 32767;
    else if (v < -32768) v = -32768;
    out[i] = v;
  }
  return out;
}
