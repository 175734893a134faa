"""Gazetteer dictionaries and rule-engine configuration.

Data transcription + compilation logic mirroring the reference's
``build_gazetteers`` (reference: ner-core/src/model.rs:279-419) and
``RuleEngine::new`` (reference: ner-core/src/rule_based.rs:47-69).

Everything here is plain-Python data computed once on the driver and
shipped to executors via closure capture / ``SparkContext.broadcast``.

Length filters are on UTF-8 *byte* length (the reference uses Rust
``str::len``), which matters for accented words ("são" is 4 bytes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ner_spark.data.corpus import extract_gazetteers_from_corpus

# reference: ner-core/src/tokenizer.rs:81-86 (case-sensitive)
ABBREVIATIONS = frozenset([
    "Dr", "Dra", "Sr", "Sra", "Prof", "Profa", "Gov", "Dep", "Sen", "Min",
    "Gen", "Cap", "Sgt", "Cel", "Brig", "Adm", "Des", "Pres", "Eng", "Arq",
    "km", "cm", "mm", "kg", "mg", "ml", "dl", "ha", "etc", "vol", "núm",
    "art", "pág", "pag", "cap", "tel", "fax", "av", "pg", "ibid", "op",
])

# reference: ner-core/src/tokenizer.rs:89-90
CLITICS = ("-se", "-nos", "-lhe", "-lhes", "-me", "-te", "-o", "-a", "-los", "-las")
SUFFIXES = ("mente", "ção", "ções", "ista", "ismo", "dade")

# reference: ner-core/src/tokenizer.rs:93-97
COMPOUNDS = frozenset([
    "são paulo", "rio de janeiro", "minas gerais", "espírito santo",
    "mato grosso", "mato grosso do sul", "rio grande do sul", "rio grande do norte",
    "estados unidos", "reino unido", "nova iorque", "sem teto", "pôr do sol",
])

# reference: ner-core/src/tokenizer.rs:276-283 (BPE-lite merge pairs, priority order)
BPE_MERGES = (
    ("e", "s"), ("a", "s"), ("o", "s"),
    ("d", "e"), ("d", "o"), ("d", "a"),
    ("q", "u"), ("u", "e"), ("e", "m"),
    ("ã", "o"), ("ç", "a"), ("ç", "o"),
    ("r", "e"), ("i", "n"), ("t", "e"),
)

# reference: ner-core/src/rule_based.rs:55-62
PERSON_TITLES = frozenset([
    "presidente", "ex-presidente", "senador", "senadora", "deputado",
    "deputada", "ministro", "ministra", "governador", "governadora",
    "prefeito", "prefeita", "general", "capitão", "dr", "dra", "prof",
    "profa", "vereador", "vereadora", "secretário", "secretária",
    "diretor", "diretora", "ceo", "jogador", "jogadora", "técnico",
    "técnica", "atleta", "ator", "atriz", "cantor", "cantora",
])

# reference: ner-core/src/rule_based.rs:64-67
ORG_INDICATORS = frozenset([
    "s.a.", "s/a", "ltda", "eireli", "me", "epp", "sa", "inc",
    "corp", "holdings", "group", "fc", "esporte", "clube",
])

# Manual entity lists (reference: ner-core/src/model.rs:321-416).
EXTRA_PERSONS = [
    "Getúlio", "Vargas", "Juscelino", "Kubitschek", "Jânio", "Quadros",
    "Costa", "Silva", "Geisel", "Figueiredo", "Sarney", "Collor", "Itamar",
    "Franco", "Cardoso", "Rousseff", "Temer", "Bolsonaro", "Haddad",
    "Mantega", "Meirelles", "Guedes", "Ciro", "Alckmin", "Moro",
    "Senna", "Pelé", "Ronaldo", "Ronaldinho", "Zico", "Garrincha",
    "Neymar", "Vini", "Rodrygo", "Casemiro", "Marquinhos",
    "Gisele", "Bündchen", "Xuxa", "Ivete", "Sangalo", "Anitta",
    "Caetano", "Veloso", "Gilberto", "Gil", "Chico", "Buarque",
    "Machado", "Assis", "Guimarães", "Rosa", "Clarice", "Lispector",
    "Oswald", "Andrade", "Drummond", "Pessoa",
]

EXTRA_LOCS = [
    "Brasília", "São Paulo", "Rio de Janeiro", "Salvador", "Fortaleza",
    "Manaus", "Curitiba", "Recife", "Porto Alegre", "Belém", "Goiânia",
    "Florianópolis", "Maceió", "Natal", "Teresina", "Campo Grande",
    "João Pessoa", "Aracaju", "Cuiabá", "Macapá", "Porto Velho",
    "Boa Vista", "Palmas", "Rio Branco", "Vitória", "São Luís",
    "Amazônia", "Pantanal", "Cerrado", "Caatinga", "Pampa",
    "Nordeste", "Sudeste", "Norte", "Sul", "Centro-Oeste",
    "Maracanã", "Itaquerão", "Arena", "Mineirão", "Beira-Rio",
    "Planalto", "Palácio", "Congresso", "Senado", "Câmara",
    "Supremo", "STF", "STJ", "TSE", "TRF",
    "Argentina", "Chile", "Colômbia", "Peru", "Venezuela", "Uruguai",
    "Paraguai", "Bolívia", "Equador", "Qatar", "Japão", "Coreia",
    "Alemanha", "França", "Espanha", "Portugal", "Itália", "Inglaterra",
    "Estados Unidos", "China", "Rússia", "Índia", "África",
    "Europa", "Ásia", "América", "Latina", "Caribe",
    "Ipiranga", "Tietê", "São Francisco", "Paraná", "Tocantins",
    "Xingu", "Negro", "Solimões", "Tapajós",
]

EXTRA_ORGS = [
    "Petrobras", "Vale", "Embraer", "Nubank", "Itaú", "Bradesco", "Santander",
    "Caixa", "Econômica", "Federal", "BNDES", "IBGE", "INPE", "Fiocruz",
    "Anvisa", "Anatel", "Aneel", "ANS", "ANP", "CADE",
    "Partidos", "PT", "PL", "MDB", "PSDB", "PDT", "PSB", "Republicanos",
    "Podemos", "União", "Brasil", "Solidariedade", "Avante",
    "Flamengo", "Palmeiras", "Corinthians", "São Paulo", "Grêmio",
    "Internacional", "Atlético", "Cruzeiro", "Fluminense", "Vasco",
    "Botafogo", "Santos", "Sport", "Bahia", "Ceará", "Fortaleza",
    "McLaren", "Ferrari", "Mercedes", "Red Bull", "Alpine",
    "ONU", "UNESCO", "UNICEF", "OMS", "FMI", "Banco Mundial",
    "BRICS", "Mercosul", "ALBA", "UNASUL", "CELAC",
    "FIFA", "CBF", "COI", "COB",
    "USP", "Unicamp", "UFRJ", "UnB", "UFMG", "UFRGS",
    "Globo", "Record", "SBT", "Band", "CNN Brasil", "UOL", "Folha",
    "Estadão", "O Globo", "Veja", "Época", "IstoÉ",
]

EXTRA_MISC = [
    "Copa do Mundo", "Olimpíadas", "Jogos Olímpicos", "Paralímpicos",
    "Libertadores", "Copa América", "Europeu", "Champions League",
    "Fórmula 1", "MotoGP", "Rally Dakar",
    "Carnaval", "Réveillon", "Natal", "São João", "Festa Junina",
    "COVID-19", "Dengue", "Febre Amarela", "Zika", "Malária",
    "PIB", "Selic", "IPCA", "IBOV", "FGTS", "INSS", "SUS",
    "Constituição", "Marco Civil", "Lei Maria da Penha", "ECA",
    "Operação Lava Jato", "Mensalão", "Privatizações",
    "Independência", "República", "Proclamação", "Abolição",
    "Inconfidência Mineira", "Revolução de 1930", "AI-5",
    "Amazônia-1", "SGDC", "VLS",
    "Gabriela Cravo e Canela", "Grande Sertão Veredas",
]


def _blen(s: str) -> int:
    return len(s.encode("utf-8"))


@dataclass
class RuleConfig:
    """Compiled gazetteers + rule lists, one immutable bundle.

    ``gaz_*`` feed the feature extractor (single lowercase words);
    ``rule_*`` feed the rule engine (persons/locations: full lowercase
    phrases matched against single tokens; orgs/misc: token-part tuples
    for n-gram matching, in match-priority order).
    """

    gaz_persons: frozenset[str] = field(default=frozenset())
    gaz_locations: frozenset[str] = field(default=frozenset())
    gaz_orgs: frozenset[str] = field(default=frozenset())
    gaz_misc: frozenset[str] = field(default=frozenset())
    rule_persons: frozenset[str] = field(default=frozenset())
    rule_locations: frozenset[str] = field(default=frozenset())
    rule_orgs: tuple[tuple[str, ...], ...] = field(default=())
    rule_misc: tuple[tuple[str, ...], ...] = field(default=())


def build_rule_config() -> RuleConfig:
    """Compile corpus-derived + manual gazetteers.

    Mirrors reference ner-core/src/model.rs:279-419; list *order* for the
    org/misc n-gram engines is corpus entries (sorted — the reference order
    is arbitrary HashSet order) followed by the manual lists in source
    order, deduplicated keeping first occurrence.
    """
    corpus_persons, corpus_locs, corpus_orgs, corpus_misc = extract_gazetteers_from_corpus()

    gaz_persons: set[str] = set()
    gaz_locations: set[str] = set()
    gaz_orgs: set[str] = set()
    gaz_misc: set[str] = set()
    rule_persons: set[str] = set()
    rule_locations: set[str] = set()
    rule_orgs: list[tuple[str, ...]] = []
    rule_misc: list[tuple[str, ...]] = []

    def add_org(name: str) -> None:
        parts = tuple(p.lower() for p in name.split())
        if parts and parts not in rule_orgs:
            rule_orgs.append(parts)

    def add_misc(name: str) -> None:
        parts = tuple(p.lower() for p in name.split())
        if parts and parts not in rule_misc:
            rule_misc.append(parts)

    # Corpus-derived entries (model.rs:286-318): per-word byte-length
    # filters feed the feature gazetteers; the rule engine gets full
    # phrases (and, for persons, also each word > 2 bytes).
    for p in corpus_persons:
        for word in p.split():
            if _blen(word) > 2:
                gaz_persons.add(word.lower())
                rule_persons.add(word.lower())
        rule_persons.add(p.lower())
    for loc in corpus_locs:
        for word in loc.split():
            if _blen(word) > 3:
                gaz_locations.add(word.lower())
        rule_locations.add(loc.lower())
    for o in corpus_orgs:
        for word in o.split():
            if _blen(word) > 3:
                gaz_orgs.add(word.lower())
        add_org(o)
    for m in corpus_misc:
        for word in m.split():
            if _blen(word) > 3:
                gaz_misc.add(word.lower())
        add_misc(m)

    # Manual lists (model.rs:321-416).
    for p in EXTRA_PERSONS:
        gaz_persons.add(p.lower())
        rule_persons.add(p.lower())
    for loc in EXTRA_LOCS:
        for word in loc.split():
            if _blen(word) > 3:
                gaz_locations.add(word.lower())
        rule_locations.add(loc.lower())
    for o in EXTRA_ORGS:
        for word in o.split():
            if _blen(word) > 2:
                gaz_orgs.add(word.lower())
        add_org(o)
    for m in EXTRA_MISC:
        for word in m.split():
            if _blen(word) > 3:
                gaz_misc.add(word.lower())
        add_misc(m)

    return RuleConfig(
        gaz_persons=frozenset(gaz_persons),
        gaz_locations=frozenset(gaz_locations),
        gaz_orgs=frozenset(gaz_orgs),
        gaz_misc=frozenset(gaz_misc),
        rule_persons=frozenset(rule_persons),
        rule_locations=frozenset(rule_locations),
        rule_orgs=tuple(rule_orgs),
        rule_misc=tuple(rule_misc),
    )


_CONFIG: RuleConfig | None = None


def default_rule_config() -> RuleConfig:
    """Process-cached default configuration (built once per worker)."""
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = build_rule_config()
    return _CONFIG
