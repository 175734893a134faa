"""Mock knowledge base + alias dictionary for entity linking.

Data transcription of the reference's 5-record KB
(reference: ner-core/src/nel.rs:33-68) plus an alias table used by the
Spark-scale broadcast-alias linking path (FIXTURES.md §6).
"""

from __future__ import annotations

# (kb_id, name, description, url)
KB_RECORDS: list[tuple[str, str, str, str]] = [
    ("Q36098", "Luiz Inácio Lula da Silva", "39º presidente do Brasil",
     "https://www.wikidata.org/wiki/Q36098"),
    ("Q155", "Brasil", "República Federativa do Brasil, país na América do Sul",
     "https://www.wikidata.org/wiki/Q155"),
    ("Q47454", "Paris Hilton", "Personalidade de televisão, empresária e socialite americana",
     "https://www.wikidata.org/wiki/Q47454"),
    ("Q90", "Paris", "Capital e a cidade mais populosa da França",
     "https://www.wikidata.org/wiki/Q90"),
    ("Q312", "Apple Inc.", "Empresa multinacional norte-americana de eletrônicos e software",
     "https://www.wikidata.org/wiki/Q312"),
]

# Type-consistency bonus targets (reference: ner-core/src/nel.rs:93-104).
KB_PER_IDS = frozenset({"Q36098", "Q47454"})
KB_LOC_IDS = frozenset({"Q155", "Q90"})
KB_ORG_IDS = frozenset({"Q312"})

# Alias dictionary (alias → kb_id); FIXTURES.md §6. "paris" is deliberately
# ambiguous to exercise the NED context rules.
KB_ALIASES: list[tuple[str, str]] = [
    ("lula", "Q36098"),
    ("luiz inácio lula da silva", "Q36098"),
    ("brasil", "Q155"),
    ("paris hilton", "Q47454"),
    ("hilton", "Q47454"),
    ("paris", "Q90"),
    ("paris", "Q47454"),
    ("apple", "Q312"),
    ("apple inc.", "Q312"),
]
