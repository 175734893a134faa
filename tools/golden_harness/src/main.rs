//! Dev-time golden generator: runs the READ-ONLY reference crate over its
//! own fixture texts and dumps tokens/tags/spans as JSON for parity tests.
//! This binary is a test oracle only; no reference code is copied into the
//! engine.
use ner_core::pipeline::{AlgorithmMode, NerPipeline};
use ner_core::tokenizer::{tokenize_with_mode, TokenizerMode};
use ner_core::corpus::{get_corpus, demo_texts};
use serde_json::json;

fn main() {
    let pipeline = NerPipeline::new();
    let mut texts: Vec<(String, String)> = vec![];
    for s in get_corpus() {
        texts.push(("corpus".into(), s.text.to_string()));
    }
    for (domain, t) in demo_texts() {
        texts.push((format!("demo:{domain}"), t.to_string()));
    }

    let modes = [
        (AlgorithmMode::Hybrid, "hybrid"),
        (AlgorithmMode::RulesOnly, "rules_only"),
        (AlgorithmMode::CrfOnly, "crf_only"),
        (AlgorithmMode::FeaturesOnly, "features_only"),
        (AlgorithmMode::Hmm, "hmm"),
        (AlgorithmMode::MaxEnt, "max_ent"),
        (AlgorithmMode::Perceptron, "perceptron"),
        (AlgorithmMode::SpanBased, "span_based"),
    ];
    let tok_modes = [
        (TokenizerMode::Standard, "standard"),
        (TokenizerMode::CharLevel, "char_level"),
        (TokenizerMode::Aggressive, "aggressive"),
        (TokenizerMode::Conservative, "conservative"),
        (TokenizerMode::BpeLite, "bpe_lite"),
    ];

    let mut out = vec![];
    for (text_id, (source, text)) in texts.iter().enumerate() {
        // tokens for every tokenizer mode
        let mut toks = serde_json::Map::new();
        for (tm, tm_name) in &tok_modes {
            let tokens: Vec<_> = tokenize_with_mode(text, *tm)
                .into_iter()
                .map(|t| json!([t.text, t.start, t.end]))
                .collect();
            toks.insert(tm_name.to_string(), json!(tokens));
        }
        // tags + spans per algorithm mode (standard tokenizer)
        let mut by_mode = serde_json::Map::new();
        for (mode, mode_name) in &modes {
            let (tagged, entities) =
                pipeline.analyze_with_mode(text, *mode, TokenizerMode::Standard);
            let tags: Vec<_> = tagged
                .iter()
                .map(|tt| json!([tt.tag.label(), tt.confidence]))
                .collect();
            let spans: Vec<_> = entities
                .iter()
                .map(|e| {
                    json!([e.text, e.category.name(), e.start_token, e.end_token,
                           e.start, e.end, e.confidence, e.source])
                })
                .collect();
            by_mode.insert(mode_name.to_string(), json!({"tags": tags, "spans": spans}));
        }
        out.push(json!({
            "text_id": text_id,
            "source": source,
            "text": text,
            "tokens": toks,
            "modes": by_mode,
        }));
    }
    println!("{}", serde_json::to_string(&out).unwrap());
}
