// Golden-boundary generator: runs the reference chunkers (included read-only via
// #[path] since the registry is offline; lib itself has no external deps) on a
// file and prints one "pos len" pair per line. Fixture generation only.
#[path = "/root/reference/src/lib.rs"]
mod cdc;

use cdc::{ae, leap_based, rabin, ram, seq, supercdc, ultra, Chunk, SizeParams};
use std::env;

fn main() {
    let args: Vec<String> = env::args().collect();
    // usage: golden_gen <file> <algo> [min avg max] [extra...]
    let buf = std::fs::read(&args[1]).unwrap();
    let algo = args[2].as_str();
    let custom = args.len() >= 6;
    let sizes = if custom {
        SizeParams::new(args[3].parse().unwrap(), args[4].parse().unwrap(), args[5].parse().unwrap())
    } else {
        match algo {
            "ae" => ae::Chunker::default_sizes(),
            "ram" => ram::Chunker::default_sizes(),
            "rabin" | "rabin_zero" => rabin::Chunker::default_sizes(),
            "seq" => seq::Chunker::default_sizes(),
            "super" | "super_records" => supercdc::Chunker::default_sizes(),
            "ultra" | "ultra_batch" => ultra::Chunker::default_sizes(),
            "leap" => leap_based::Chunker::default_sizes(),
            _ => panic!("unknown algo"),
        }
    };
    let chunks: Vec<Chunk> = match algo {
        "ae" => ae::Chunker::new(&buf, sizes).collect(),
        "ram" => {
            let win: usize = args.get(6).map(|s| s.parse().unwrap()).unwrap_or(32);
            ram::Chunker::new(&buf, sizes, win).collect()
        }
        "rabin" => {
            if custom {
                rabin::Chunker::with_params(&buf, rabin::ChunkerParams::new(), sizes).collect()
            } else {
                rabin::Chunker::new(&buf).collect()
            }
        }
        "rabin_zero" => rabin::Chunker::with_params(&buf, rabin::ChunkerParams::default(), sizes).collect(),
        "seq" => {
            let mode = match args.get(6).map(String::as_str).unwrap_or("inc") {
                "dec" => seq::OperationMode::Decreasing,
                _ => seq::OperationMode::Increasing,
            };
            seq::Chunker::new(&buf, sizes, mode, seq::Config::default()).collect()
        }
        "super" => {
            if custom {
                supercdc::Chunker::with_records(&buf, Default::default(), sizes).collect()
            } else {
                supercdc::Chunker::new(&buf).collect()
            }
        }
        "super_records" => {
            // cross-file record-map reuse (supercdc.rs:49-59, 156-158):
            // chunk the first half, carry its records into a full-buffer run
            let half = &buf[..buf.len() / 2];
            let mut seed = supercdc::Chunker::with_records(half, Default::default(), sizes);
            let _drain: Vec<Chunk> = seed.by_ref().collect();
            let records = seed.give_records();
            supercdc::Chunker::with_records(&buf, records, sizes).collect()
        }
        "ultra" => ultra::Chunker::new(&buf, sizes).collect(),
        "ultra_batch" => ultra::Chunker::new(&buf, sizes).generate_chunks(),
        "leap" => leap_based::Chunker::new(&buf, sizes).collect(),
        _ => panic!("unknown algo"),
    };
    for c in chunks {
        println!("{} {}", c.pos, c.len);
    }
}
