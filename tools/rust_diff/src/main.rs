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
//!   NED   <tid> <start_token> <end_token> <original_tag> <resolved_tag>
//!         <confidence>                       (hybrid, ned::disambiguate —
//!                                             ner-web/src/main.rs:217-225)
//!   NEL   <tid> <start_token> <end_token> <resolved_tag> <kb_id|->
//!         <score>                            (hybrid → NED → KB::link —
//!                                             ner-web/src/main.rs:225-233)
//!   SOTA  <tid> <start_token> <end_token> <start> <end> <class>
//!         <score> <escaped text>             (simulate_gliner, threshold
//!                                             0.5, max span 4, classes
//!                                             "Pessoa, Local, Organizacao,
//!                                             Data" — ner-web sota.html
//!                                             default + main.rs:246-258)

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

        // NED + NEL over the hybrid pipeline, composed exactly as the
        // reference web handlers do (ner-web/src/main.rs:217-236)
        let (tagged, entities) =
            pipeline.analyze_with_mode(&text, AlgorithmMode::Hybrid, TokenizerMode::Standard);
        let tokens: Vec<_> = tagged.into_iter().map(|t| t.token).collect();
        let disambiguated = ner_core::ned::disambiguate(&tokens, &entities);
        for d in disambiguated.iter() {
            writeln!(
                out,
                "NED\t{}\t{}\t{}\t{}\t{}\t{:.12}",
                tid, d.entity.start_token, d.entity.end_token,
                d.original_tag, d.resolved_tag, d.confidence
            )
            .unwrap();
        }
        let kb = ner_core::nel::KnowledgeBase::new();
        for l in kb.link(&disambiguated).iter() {
            writeln!(
                out,
                "NEL\t{}\t{}\t{}\t{}\t{}\t{:.12}",
                tid,
                l.disambiguated.entity.start_token,
                l.disambiguated.entity.end_token,
                l.disambiguated.resolved_tag,
                l.kb_match.as_ref().map(|r| r.id.as_str()).unwrap_or("-"),
                l.match_score
            )
            .unwrap();
        }

        // GLiNER simulator with the web UI's default classes
        // (ner-web/templates/sota.html:152, handler main.rs:246-258)
        let classes: Vec<String> = ["Pessoa", "Local", "Organizacao", "Data"]
            .iter()
            .map(|s| s.to_string())
            .collect();
        let sota_tokens =
            ner_core::tokenizer::tokenize_with_mode(&text, TokenizerMode::Standard);
        for p in ner_core::sota_2024::simulate_gliner(&sota_tokens, &classes, 0.5, 4).iter() {
            writeln!(
                out,
                "SOTA\t{}\t{}\t{}\t{}\t{}\t{}\t{:.12}\t{}",
                tid, p.entity.start_token, p.entity.end_token,
                p.entity.start, p.entity.end, p.class_name,
                p.similarity_score, esc(&p.entity.text)
            )
            .unwrap();
        }
    }
}
