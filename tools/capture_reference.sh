#!/usr/bin/env bash
# Regenerate TRUE reference bytes for every frozen fixture and diff them
# against tests/fixtures/*.jpg.
#
# This environment has no Rust toolchain, so the fixtures were frozen from
# tpuenc's own host-oracle output (validated through the independent
# in-repo T.81 decoder + Pillow).  Run this script anywhere cargo IS
# available to close the remaining parity gap against the actual
# vstroebel/jpeg-encoder crate:
#
#   REF=/path/to/jpeg-encoder ./tools/capture_reference.sh
#
# It exports each fixture's raw input + settings (tests/fixtures/generate.py
# --export), builds a tiny cargo harness with a path dependency on the
# reference, encodes every case with the reference encoder, and byte-diffs
# the outputs against the frozen fixtures.
set -euo pipefail

REF=${REF:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${WORK:-$(mktemp -d /tmp/tpuenc-capture.XXXXXX)}
INPUTS="$WORK/inputs"

if ! command -v cargo >/dev/null 2>&1; then
    echo "error: cargo not found — run this in an environment with Rust" >&2
    exit 2
fi
[ -f "$REF/Cargo.toml" ] || { echo "error: $REF is not a cargo crate" >&2; exit 2; }

python "$REPO/tests/fixtures/generate.py" --export "$INPUTS"

mkdir -p "$WORK/harness/src"
cat > "$WORK/harness/Cargo.toml" <<EOF
[package]
name = "capture_reference"
version = "0.1.0"
edition = "2021"

[dependencies]
jpeg-encoder = { path = "$REF" }
EOF

cat > "$WORK/harness/src/main.rs" <<'EOF'
use jpeg_encoder::{
    ColorType, Encoder, PixelDensity, PixelDensityUnit, QuantizationTableType,
    SamplingFactor,
};
use std::fs;
use std::io::Read;

fn qtable(spec: &str) -> QuantizationTableType {
    match spec {
        "default" => QuantizationTableType::Default,
        "flat" => QuantizationTableType::Flat,
        "custom_ms_ssim" => QuantizationTableType::CustomMsSsim,
        "custom_psnr_hvs" => QuantizationTableType::CustomPsnrHvs,
        "image_magick" => QuantizationTableType::ImageMagick,
        "klein_silverstein_carney" => QuantizationTableType::KleinSilversteinCarney,
        "dental_x_rays" => QuantizationTableType::DentalXRays,
        "visual_detection_model" => QuantizationTableType::VisualDetectionModel,
        "improved_detection_model" => QuantizationTableType::ImprovedDetectionModel,
        s if s.starts_with("custom:") => {
            let vals: Vec<u16> = s[7..]
                .split(',')
                .map(|v| v.parse().unwrap())
                .collect();
            let mut t = [0u16; 64];
            t.copy_from_slice(&vals);
            QuantizationTableType::Custom(Box::new(t))
        }
        _ => panic!("unknown qtable spec {}", spec),
    }
}

fn color(name: &str) -> ColorType {
    match name {
        "Luma" => ColorType::Luma,
        "Rgb" => ColorType::Rgb,
        "Rgba" => ColorType::Rgba,
        "Bgr" => ColorType::Bgr,
        "Bgra" => ColorType::Bgra,
        "Ycbcr" => ColorType::Ycbcr,
        "Cmyk" => ColorType::Cmyk,
        "CmykAsYcck" => ColorType::CmykAsYcck,
        "Ycck" => ColorType::Ycck,
        _ => panic!("unknown color {}", name),
    }
}

fn main() {
    let dir = std::env::args().nth(1).expect("usage: capture <inputs-dir>");
    let manifest = fs::read_to_string(format!("{}/manifest.txt", dir)).unwrap();
    for line in manifest.lines() {
        let f: Vec<&str> = line.split_whitespace().collect();
        let (name, w, h) = (f[0], f[1].parse::<u16>().unwrap(), f[2].parse::<u16>().unwrap());
        let quality: u8 = f[4].parse().unwrap();
        let raw = fs::read(format!("{}/{}.raw", dir, name)).unwrap();

        let mut enc = Encoder::new_file(
            format!("{}/{}.ref.jpg", dir, name), quality).unwrap();
        let (hs, vs) = (f[5].parse::<u8>().unwrap(), f[6].parse::<u8>().unwrap());
        enc.set_sampling_factor(SamplingFactor::from_factors(hs, vs).unwrap());
        let prog: i32 = f[7].parse().unwrap();
        if prog > 0 { enc.set_progressive_scans(prog as u8); }
        let rst: i32 = f[8].parse().unwrap();
        if rst > 0 { enc.set_restart_interval(rst as u16); }
        if f[9] == "1" { enc.set_optimized_huffman_tables(true); }
        enc.set_quantization_tables(qtable(f[10]), qtable(f[11]));
        let (dx, dy, du) = (
            f[12].parse::<u16>().unwrap(),
            f[13].parse::<u16>().unwrap(),
            f[14].parse::<u8>().unwrap(),
        );
        if (dx, dy, du) != (1, 1, 0) {
            let unit = match du {
                1 => PixelDensityUnit::Inches,
                2 => PixelDensityUnit::Centimeters,
                _ => PixelDensityUnit::PixelAspectRatio,
            };
            enc.set_density(PixelDensity { density: (dx, dy), unit });
        }
        if let Ok(mut af) = fs::File::open(format!("{}/{}.apps", dir, name)) {
            loop {
                let mut hdr = [0u8; 5];
                match af.read_exact(&mut hdr) {
                    Ok(()) => {}
                    Err(_) => break,
                }
                let n = u32::from_be_bytes([hdr[1], hdr[2], hdr[3], hdr[4]]) as usize;
                let mut data = vec![0u8; n];
                af.read_exact(&mut data).unwrap();
                enc.add_app_segment(hdr[0], data).unwrap();
            }
        }
        enc.encode(&raw, w, h, color(f[3])).unwrap();
        println!("encoded {}", name);
    }
}
EOF

( cd "$WORK/harness" && cargo build --release --quiet )
"$WORK/harness/target/release/capture_reference" "$INPUTS"

fail=0
for ref in "$INPUTS"/*.ref.jpg; do
    name=$(basename "$ref" .ref.jpg)
    ours="$REPO/tests/fixtures/$name.jpg"
    if cmp -s "$ref" "$ours"; then
        echo "PASS  $name"
    else
        echo "FAIL  $name  (reference bytes differ — see $ref vs $ours)"
        fail=1
    fi
done
exit $fail
