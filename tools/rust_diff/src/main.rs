//! Dump the reference engine's tokens, per-token tags and entity spans
//! for every input text × algorithm mode (× tokenizer mode for raw
//! tokens), as tab-separated lines compare.py can parse.
//!
//! Input: a file with one text per line, real newlines escaped as \n.
//! Output lines:
//!   TOKEN <tid> <tokmode> <idx> <start> <end> <escaped text>
//!   TAG   <tid> <algmode> <idx> <label> <confidence>
//!   SPAN  <tid> <algmode> <start_token> <end_token> <start> <end>
//!         <category> <confidence> <source> <escaped text>

use std::io::{BufRead, BufReader, Write};

use ner_core::tokenizer::tokenize_with_mode;
use ner_core::{AlgorithmMode, NerPipeline, TokenizerMode};

fn esc(s: &str) -> String {
    s.replace('\\', "\\\\").replace('\t', "\\t").replace('\n', "\\n")
}

fn unesc(s: &str) -> String {
    let mut out = String::with_capacity(s.len());
    let mut it = s.chars();
    while let Some(c) = it.next() {
        if c == '\\' {
            match it.next() {
                Some('n') => out.push('\n'),
                Some('t') => out.push('\t'),
                Some('\\') => out.push('\\'),
                Some(o) => {
                    out.push('\\');
                    out.push(o);
                }
                None => out.push('\\'),
            }
        } else {
            out.push(c);
        }
    }
    out
}

fn main() {
    let args: Vec<String> = std::env::args().collect();
    let input = args.get(1).expect("usage: ner-dump <texts-file>");

    let alg_modes = [
        ("hybrid", AlgorithmMode::Hybrid),
        ("rules_only", AlgorithmMode::RulesOnly),
        ("crf_only", AlgorithmMode::CrfOnly),
        ("features_only", AlgorithmMode::FeaturesOnly),
        ("hmm", AlgorithmMode::Hmm),
        ("max_ent", AlgorithmMode::MaxEnt),
        ("perceptron", AlgorithmMode::Perceptron),
        ("span_based", AlgorithmMode::SpanBased),
    ];
    let tok_modes = [
        ("standard", TokenizerMode::Standard),
        ("char_level", TokenizerMode::CharLevel),
        ("aggressive", TokenizerMode::Aggressive),
        ("conservative", TokenizerMode::Conservative),
        ("bpe_lite", TokenizerMode::BpeLite),
    ];

    let pipeline = NerPipeline::new();
    let f = std::fs::File::open(input).expect("open input");
    let stdout = std::io::stdout();
    let mut out = std::io::BufWriter::new(stdout.lock());

    for (tid, line) in BufReader::new(f).lines().enumerate() {
        let text = unesc(&line.expect("read line"));
        for (tname, tmode) in tok_modes.iter() {
            for tok in tokenize_with_mode(&text, *tmode).iter() {
                writeln!(
                    out,
                    "TOKEN\t{}\t{}\t{}\t{}\t{}\t{}",
                    tid, tname, tok.index, tok.start, tok.end, esc(&tok.text)
                )
                .unwrap();
            }
        }
        for (mname, mode) in alg_modes.iter() {
            let (tagged, spans) =
                pipeline.analyze_with_mode(&text, *mode, TokenizerMode::Standard);
            for tt in tagged.iter() {
                writeln!(
                    out,
                    "TAG\t{}\t{}\t{}\t{}\t{:.12}",
                    tid, mname, tt.token.index, tt.tag.label(), tt.confidence
                )
                .unwrap();
            }
            for s in spans.iter() {
                writeln!(
                    out,
                    "SPAN\t{}\t{}\t{}\t{}\t{}\t{}\t{}\t{:.12}\t{}\t{}",
                    tid, mname, s.start_token, s.end_token, s.start, s.end,
                    s.category.name(), s.confidence, s.source, esc(&s.text)
                )
                .unwrap();
            }
        }
    }
}
