// Node runner for the browser codec self-test: the exact assertions
// web/test.html runs in a browser, executable headlessly in CI
// (`node web/run_tests.mjs`). Encode must be byte-identical to the
// Python/TPU encoder and decode sample-identical, across every fixture in
// test_fixtures.json (generated from tests/fixtures/*.npz).
// Analog of the reference's wasm CI build (.github/workflows/build_wasm.yml),
// strengthened from "it builds" to "it agrees with the other backends".
import { readFileSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

import { seaDecode } from "./sea_decoder.mjs";
import { seaEncode } from "./sea_encoder.mjs";

const here = dirname(fileURLToPath(import.meta.url));
const fixtures = JSON.parse(
  readFileSync(join(here, "test_fixtures.json"), "utf8"),
);
const b64 = (s) => new Uint8Array(Buffer.from(s, "base64"));

let failures = 0;
for (const [name, fx] of Object.entries(fixtures)) {
  try {
    const want = b64(fx.encoded);
    if (!fx.decode_only) {
      const input = new Int16Array(b64(fx.input).buffer);
      const got = seaEncode(input, fx.rate, fx.channels, {
        scaleFactorBits: fx.sfb,
        scaleFactorFrames: fx.sff,
        residualBits: fx.rb,
        framesPerChunk: fx.fpc,
        vbr: fx.vbr,
      });
      let same = got.length === want.length;
      let at = -1;
      if (same)
        for (let i = 0; i < got.length; i++)
          if (got[i] !== want[i]) { same = false; at = i; break; }
      if (!same) {
        failures++;
        console.log(
          `FAIL ${name}: encode mismatch (len ${got.length} vs ${want.length}, first diff @${at})`,
        );
        continue;
      }
    }
    const dec = seaDecode(
      want.buffer.slice(want.byteOffset, want.byteOffset + want.byteLength),
    );
    const wantPcm = new Int16Array(b64(fx.decoded).buffer);
    let decSame = dec.samples.length === wantPcm.length;
    let decAt = -1;
    if (decSame)
      for (let i = 0; i < wantPcm.length; i++)
        if (dec.samples[i] !== wantPcm[i]) { decSame = false; decAt = i; break; }
    if (!decSame) {
      failures++;
      console.log(
        `FAIL ${name}: decode mismatch (len ${dec.samples.length} vs ${wantPcm.length}, first diff @${decAt})`,
      );
      continue;
    }
    console.log(
      fx.decode_only
        ? `PASS ${name}: decode sample-identical (${dec.samples.length})`
        : `PASS ${name}: encode byte-identical (${want.length} B), decode sample-identical (${dec.samples.length})`,
    );
  } catch (e) {
    failures++;
    console.log(`FAIL ${name}: ${e.message}`);
  }
}
console.log(failures ? `${failures} FAILURES` : "ALL PASS");
process.exit(failures ? 1 : 0);
