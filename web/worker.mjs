// worker.mjs — Web Worker running the pure-JS SEA codec off the UI thread.
// Message-port RPC mirroring the reference demo's worker surface
// (encodeSEA / decodeSEA with timing + PSNR), but importing the dependency-
// free JS codec instead of a WASM build.

import { seaDecode } from "./sea_decoder.mjs";
import { seaEncode } from "./sea_encoder.mjs";
import { differenceSignal, encodeWav, psnr } from "./utils.mjs";

self.onmessage = (e) => {
  const { id, op, payload } = e.data;
  try {
    if (op === "encodeSEA") {
      // payload: {samples: Int16Array, sampleRate, channels, settings}
      const t0 = performance.now();
      const encoded = seaEncode(
        payload.samples, payload.sampleRate, payload.channels, payload.settings
      );
      const encodeMs = performance.now() - t0;
      const t1 = performance.now();
      const rt = seaDecode(encoded.buffer);
      const decodeMs = performance.now() - t1;
      const quality = psnr(payload.samples, rt.samples);
      const diff = encodeWav(
        differenceSignal(payload.samples, rt.samples),
        payload.channels,
        payload.sampleRate
      );
      self.postMessage(
        {
          id,
          result: {
            encoded,
            encodeMs,
            decodeMs,
            psnr: quality,
            roundtrip: rt.samples,
            diffWav: diff,
          },
        },
        [encoded.buffer, rt.samples.buffer, diff.buffer]
      );
    } else if (op === "decodeSEA") {
      const t0 = performance.now();
      const out = seaDecode(payload.buffer);
      const decodeMs = performance.now() - t0;
      self.postMessage(
        {
          id,
          result: {
            samples: out.samples,
            sampleRate: out.sampleRate,
            channels: out.channels,
            metadata: out.metadata,
            decodeMs,
          },
        },
        [out.samples.buffer]
      );
    } else {
      throw new Error(`unknown op ${op}`);
    }
  } catch (err) {
    self.postMessage({ id, error: err.message });
  }
};
