#!/usr/bin/env python3
"""Golden-fixture generator (run once, offline; outputs committed).

Runs the REFERENCE implementation at /root/reference (read-only, studied
for behavior) over a deterministic synthetic corpus and dumps JSON goldens
under src/test/resources/golden/ for the ScalaTest parity suites
(per-turn/per-chunk text equality — the `sbt -batch test` gate from
BASELINE.json).

rank_bm25 is not installed in this sandbox; a faithful stand-in for
BM25Okapi (public formula + epsilon-floored idf, per the published
dorianbrown/rank_bm25 package docs) is injected so the reference's
BM25Index/_tokenize and rrf.py run unmodified.
"""

import json
import math
import random
import sys
import types
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/golden"
OUT.mkdir(parents=True, exist_ok=True)

# ---- stub rank_bm25 with the public BM25Okapi math -------------------------


class BM25Okapi:
    def __init__(self, corpus, tokenizer=None, k1=1.5, b=0.75, epsilon=0.25):
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.corpus_size = len(corpus)
        self.doc_len = [len(d) for d in corpus]
        self.avgdl = sum(self.doc_len) / max(self.corpus_size, 1)
        self.doc_freqs = []
        nd = {}
        for doc in corpus:
            freqs = {}
            for w in doc:
                freqs[w] = freqs.get(w, 0) + 1
            self.doc_freqs.append(freqs)
            for w in freqs:
                nd[w] = nd.get(w, 0) + 1
        self.idf = {}
        idf_sum = 0.0
        negative = []
        for w, df in nd.items():
            idf = math.log(self.corpus_size - df + 0.5) - math.log(df + 0.5)
            self.idf[w] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(w)
        self.average_idf = idf_sum / len(self.idf) if self.idf else 0.0
        eps = self.epsilon * self.average_idf
        for w in negative:
            self.idf[w] = eps

    def get_scores(self, query):
        scores = [0.0] * self.corpus_size
        for q in query:
            idf = self.idf.get(q) or 0.0
            for i, freqs in enumerate(self.doc_freqs):
                f = freqs.get(q, 0)
                denom = f + self.k1 * (1 - self.b + self.b * self.doc_len[i] / self.avgdl)
                scores[i] += idf * (f * (self.k1 + 1)) / denom if denom else 0.0
        return scores


fake = types.ModuleType("rank_bm25")
fake.BM25Okapi = BM25Okapi
sys.modules["rank_bm25"] = fake

sys.path.insert(0, "/root/reference")
from app.processing.chunker import SemanticChunker  # noqa: E402
from app.retrieval.bm25_index import BM25Index  # noqa: E402
from app.retrieval.rrf import reciprocal_rank_fusion  # noqa: E402


# ---- corpus ----------------------------------------------------------------

rng = random.Random(42)
WORDS = (
    "spark shuffle join scan filter window batch stream data table row key "
    "merge sort hash agg query plan stage task executor partition skew salt "
    "bloom codegen column parquet vector rank fusion chunk overlap sentence "
    "tokenize index score corpus document turn transcript extract"
).split()
POLISH = "zażółć gęślą jaźń łódź świerszcz ćma źdźbło".split()


def sentence(n, caps=True, punct="."):
    ws = [rng.choice(WORDS) for _ in range(n)]
    s = " ".join(ws)
    if caps:
        s = s[0].upper() + s[1:]
    return s + punct


def para(n_sent):
    return " ".join(sentence(rng.randint(4, 18)) for _ in range(n_sent))


cases = {}
cases["empty"] = ""
cases["spaces"] = "   \t\n  "
cases["one_word"] = "Hello"
cases["one_sentence"] = "The quick brown fox jumps over the lazy dog."
cases["no_punct"] = " ".join(rng.choice(WORDS) for _ in range(200))
cases["short_para"] = para(3)
cases["long_para"] = para(60)
cases["very_long_sentence"] = (
    "Beginning " + " ".join(rng.choice(WORDS) for _ in range(400)) + "."
)
cases["exclaim_question"] = (
    "Is this a test? Yes! It really is. But WHY would it be. OK then."
)
cases["lowercase_after_punct"] = "first part. second part. Third Part. fourth."
cases["unicode_polish"] = (
    "Zażółć gęślą jaźń. " + " ".join(rng.choice(POLISH) for _ in range(80))
    + ". Świerszcz ćwierka. Łódź płynie!"
)
cases["tabs_newlines"] = "Line one.\nLine two!\tLine three? Line four.\n\nLine five."
cases["numbers_abbrev"] = (
    "In 2024 Dr. Smith found 3.14 interesting. The value e.g. 2.71 was close. "
    "See Fig. 4 for details. Results improved by 12.5 percent."
)
cases["trailing_ws"] = para(5) + "   \n"
cases["punct_only"] = "!?. ... !!"
cases["mixed_heading_doc"] = (
    "INTRODUCTION\n"
    + para(8)
    + "\n2. Methods And Materials\n"
    + para(12)
    + "\nconclusion text follows here with more words. "
    + para(3)
)
for i in range(12):
    n = rng.randint(1, 40)
    cases[f"rand_{i}"] = para(n)
# sentences exactly at boundary sizes
cases["boundary_512"] = ("A" + "b" * 250 + ". ") * 6
cases["newline_sep"] = "One sentence here.\nAnother One Follows.\nAnd a third."

# ---- astral-plane cases (round 4): Python len() counts code points, the
# JVM counts UTF-16 units — these cases pin the chunker's code-point
# arithmetic (surrogate pairs in length tests, overlap-tail slicing,
# word-split, char-slice windows). Separate RNG: the main stream above
# stays undisturbed so pre-existing golden entries regenerate identically.
rng2 = random.Random(77)
EMOJI = list("🚀🌍🔥🎉🧠💡🐍📦🎯🌊🦀🪐")  # all U+1F3xx–U+1FAxx (astral)
MATH = list("𝕊𝕡𝕒𝕣𝕜𝔾𝕣𝕒𝕗𝕥")  # U+1D53x mathematical letters (astral)


def astral_sentence(n, punct="."):
    ws = []
    for _ in range(n):
        r = rng2.random()
        if r < 0.3:
            ws.append("".join(rng2.choice(EMOJI) for _ in range(rng2.randint(1, 4))))
        elif r < 0.45:
            ws.append(rng2.choice(WORDS) + rng2.choice(EMOJI))
        elif r < 0.55:
            ws.append("".join(rng2.choice(MATH) for _ in range(rng2.randint(2, 5))))
        else:
            ws.append(rng2.choice(WORDS))
    s = " ".join(ws)
    return "A" + s + punct  # leading cap so the sentence split fires


cases["astral_simple"] = "Emoji 🚀 test. Another 🌍 sentence! Plain end."
cases["astral_para"] = " ".join(
    astral_sentence(rng2.randint(4, 18)) for _ in range(24)
)
# sentences whose UTF-16 length (~2x) crosses chunk_size while the
# code-point length does not: the length-test divergence trigger
cases["astral_boundary"] = ("B" + "🚀" * 250 + ". ") * 6
cases["astral_boundary_mixed"] = ("C" + "x🔥" * 167 + ". ") * 6
# one giant sentence of astral words: the 2x-size word-split safety path
cases["astral_long_sentence"] = (
    "Beginning " + " ".join(
        "".join(rng2.choice(EMOJI + MATH) for _ in range(rng2.randint(1, 6)))
        for _ in range(400)
    ) + "."
)
# astral chars adjacent to the sentence separators the overlap tail and
# char-slice back-off probe for (". ", "! ", "? ")
cases["astral_sep_adjacent"] = " ".join(
    astral_sentence(rng2.randint(3, 9), punct=rng2.choice(".!?")) for _ in range(30)
)
cases["astral_polish_mix"] = (
    "Zażółć 🦀 gęślą jaźń. " + " ".join(
        rng2.choice(POLISH + EMOJI) for _ in range(80)
    ) + ". Łódź 🪐 płynie!"
)
cases["astral_only"] = "".join(rng2.choice(EMOJI) for _ in range(700))
# (a lone-surrogate case cannot ride JSON goldens — UTF-8 encoding
# rejects it; the Scala side counts a lone surrogate as one code point,
# matching CPython, asserted directly in ChunkerParitySpec)
cases["astral_heading_doc"] = (
    "🚀 MISSION OVERVIEW\n" + astral_sentence(40) + " " + astral_sentence(35)
    + "\n2. Flight 🌍 Data\n" + astral_sentence(50)
)

PARAMS = [(512, 50), (100, 10), (64, 0), (50, 25)]

chunker_golden = []
for cid, text in cases.items():
    entry = {"id": cid, "text": text, "params": []}
    for size, ov in PARAMS:
        c = SemanticChunker(size, ov)
        sentences = c._split_into_sentences(text) if text else []
        raw_chunks = c._split_text_with_overlap(text)
        overlap_t = c._get_overlap_text(text) if text else ""
        entry["params"].append(
            {
                "size": size,
                "overlap": ov,
                "sentences": sentences,
                "chunks": raw_chunks,
                "stripped": [t.strip() for t in raw_chunks],
                "overlap_text": overlap_t,
            }
        )
    chunker_golden.append(entry)
(OUT / "chunker_cases.json").write_text(
    json.dumps(chunker_golden, ensure_ascii=False), encoding="utf-8"
)

# ---- structure-aware chunking over block lists ------------------------------


class _TB:  # minimal stand-in for app.models.parsing.TextBlock
    def __init__(self, content, page):
        self.content = content
        self.page = page
        self.font_size = None


class _PD:
    def __init__(self, blocks):
        self.text_blocks = blocks
        self.images = []


struct_cases = {
    "paper": [
        ("INTRODUCTION", 0),
        (para(6), 0),
        (para(4), 1),
        ("2. Related Work", 1),
        (para(10), 1),
        ("Conclusion And Future Work", 2),
        (para(2), 2),
    ],
    "no_headings": [(para(5), 0), (para(7), 1)],
    "heading_only": [("ABSTRACT", 0)],
    "long_section": [("1. Data", 0), (para(40), 0)],
    "heading_first_empty": [("METHODS", 0), (para(3), 0), ("RESULTS", 1), (para(3), 1)],
    # astral blocks: section fits-whole test + chunk_length metadata in
    # code points, heading detection over astral text
    "astral_sections": [
        ("LAUNCH 🚀 REPORT", 0),
        (" ".join(astral_sentence(rng2.randint(4, 12)) for _ in range(6)), 0),
        ("2. Orbital 🌍 Mechanics", 1),
        (" ".join(astral_sentence(rng2.randint(4, 12)) for _ in range(12)), 1),
    ],
    "astral_flat": [
        (" ".join(astral_sentence(rng2.randint(3, 10)) for _ in range(5)), 0),
        (" ".join(astral_sentence(rng2.randint(3, 10)) for _ in range(7)), 1),
    ],
}
struct_golden = []
for cid, blocks in struct_cases.items():
    pd = _PD([_TB(t, p) for t, p in blocks])
    for size, ov in [(512, 50), (100, 10)]:
        c = SemanticChunker(size, ov)
        chunks = c.chunk_with_structure(pd, "doc")
        struct_golden.append(
            {
                "id": cid,
                "size": size,
                "overlap": ov,
                "blocks": [{"text": t, "page": p} for t, p in blocks],
                "chunks": [
                    {
                        "content": ch.content,
                        "page": ch.page,
                        "chunk_index": ch.chunk_index,
                        "section_boundary": ch.metadata.get("section_boundary"),
                        "section_heading": ch.metadata.get("section_heading"),
                        "chunk_length": ch.metadata.get("chunk_length"),
                    }
                    for ch in chunks
                ],
            }
        )
        # flat chunk_document path too
        flat = c.chunk_document(pd, "doc")
        struct_golden.append(
            {
                "id": cid + "__flat",
                "size": size,
                "overlap": ov,
                "blocks": [{"text": t, "page": p} for t, p in blocks],
                "chunks": [
                    {
                        "content": ch.content,
                        "page": ch.page,
                        "chunk_index": ch.chunk_index,
                        "section_boundary": None,
                        "section_heading": None,
                        "chunk_length": ch.metadata.get("chunk_length"),
                    }
                    for ch in flat
                ],
            }
        )
(OUT / "structure_cases.json").write_text(
    json.dumps(struct_golden, ensure_ascii=False), encoding="utf-8"
)

# ---- heading detection -------------------------------------------------------

heading_texts = [
    "INTRODUCTION", "A", "AB", "ABC", "ABCD", "1. Introduction",
    "12 Methods", "3.Results", "99.  Discussion Points",
    "The Quick Brown Fox Jumps", "the quick brown fox jumps",
    "Short Title Here", "x " * 60, "Mixed CASE but Mostly Capitalized Words Here",
    "lower case words only here", "Title With one lower word",
    "ZAŻÓŁĆ GĘŚLĄ", "1. introduction", "", " ", "A B C D E",
    para(1), para(8),
    # astral: len() in code points (the >100 cut), isupper over
    # uncased astral chars, title-case ratio with astral-led words
    "🚀 MISSION", "ROCKET 🚀🌍🔥 LAUNCH", "🎯" * 60, "🎯" * 120,
    "🚀 " * 40 + "END", "1. 𝕊park Overview", "Astral 🧠 Title Words Here",
    "𝕊𝕡𝕒𝕣𝕜 𝔾𝕣𝕒𝕗𝕥", "A" * 80 + "🚀" * 15, "A" * 99 + "🚀🚀",
    # all-caps astral strings at/below the len(text) > 3 cut: len() counts
    # CODE POINTS, so 2-3 astral caps (4-6 UTF-16 units) are NOT headings
    "𝔸𝔹", "𝔸𝔹𝔻", "𝔸𝔹𝔻𝔼", "AB🚀", "A🚀B", "AB🚀C", "ABC🚀D",
    # uncased FIRST char defeats the title-ratio rescue: these hinge
    # entirely on the isupper branch's code-point len(text) > 3 gate
    "🚀AB", "🚀🚀AB", "🚀A", "🚀ABC",
]
c = SemanticChunker(512, 50)
(OUT / "heading_cases.json").write_text(
    json.dumps(
        [{"text": t, "is_heading": c._is_likely_heading(t, None)} for t in heading_texts],
        ensure_ascii=False,
    ),
    encoding="utf-8",
)

# ---- tokenizer ---------------------------------------------------------------

tok_texts = [
    "The quick brown fox!", "a an the of", "IN ON AT", "...", "",
    "Hello, world! It's 2024.", "don't stop-me_now", "über café naïve",
    "zażółć GĘŚLĄ jaźń", "a b c d", "x1 y2 z3 a",
    "the the the", "Spark's shuffle & join — costs 3.14%",
    para(3), cases["no_punct"][:200],
]
idx = BM25Index()
(OUT / "tokenizer_cases.json").write_text(
    json.dumps(
        [{"text": t, "tokens": idx._tokenize(t)} for t in tok_texts],
        ensure_ascii=False,
    ),
    encoding="utf-8",
)

# ---- BM25 scores (micro corpus, full score vector + top-k search) ------------

corpus = [
    ("c0", "spark shuffle join performance tuning guide"),
    ("c1", "the quick brown fox jumps over the lazy dog"),
    ("c2", "join order and shuffle cost in spark query plans"),
    ("c3", "chunk overlap sentence tokenize index"),
    ("c4", "spark spark spark shuffle shuffle join"),
    ("c5", "completely unrelated gardening tips for tomato plants"),
    ("c6", para(2)),
    ("c7", "fox jumps spark"),
]
bm25_golden = []
for k1, b in [(1.5, 0.75), (1.2, 0.9)]:
    idx = BM25Index(k1=k1, b=b)
    idx.add_documents([c[0] for c in corpus], [c[1] for c in corpus], [{} for _ in corpus])
    for q in ["spark join", "fox", "the of a", "tomato spark spark", "zzz missing"]:
        scores = idx.bm25.get_scores(idx._tokenize(q))
        bm25_golden.append(
            {
                "k1": k1,
                "b": b,
                "query": q,
                "query_tokens": idx._tokenize(q),
                "scores": {c[0]: s for c, s in zip(corpus, scores)},
                "topk": idx.search(q, top_k=4),
            }
        )
(OUT / "bm25_cases.json").write_text(
    json.dumps(
        {"corpus": [{"id": i, "text": t} for i, t in corpus], "cases": bm25_golden},
        ensure_ascii=False,
    ),
    encoding="utf-8",
)

# ---- RRF ----------------------------------------------------------------------

rrf_golden = []
lists = {
    "two_lists": ([["a", "b", "c", "d"], ["c", "a", "e"]], [0.7, 0.3]),
    "unweighted": ([["a", "b"], ["b", "a"], ["c"]], None),
    "empty_one": ([[], ["x", "y"]], [0.7, 0.3]),
    "single": ([["p", "q", "r"]], [1.0]),
}
for cid, (ls, ws) in lists.items():
    scores = reciprocal_rank_fusion(ls, weights=ws, k=60, id_fn=lambda x: x)
    rrf_golden.append({"id": cid, "lists": ls, "weights": ws, "scores": scores})
(OUT / "rrf_cases.json").write_text(json.dumps(rrf_golden), encoding="utf-8")


# ---- F7 char-slice chunker (multimodal_chunker.py:107-143) -----------------

from app.processing.multimodal.multimodal_chunker import MultimodalChunker  # noqa: E402
from app.models.parsing import TextBlock  # noqa: E402

# The reference's loop does NOT terminate when the only separator sits at
# the window head (start = end - overlap steps backward and oscillates) —
# e.g. sparse-punctuation text at size=100/overlap=10. Such combos are
# skipped (pieces = None); the Scala port documents the divergence (it
# forces forward progress) and the spec only checks terminating combos.
import signal


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout()


signal.signal(signal.SIGALRM, _alarm)

charslice_texts = []
for cid, text in cases.items():
    entry = {"id": cid, "text": text, "params": []}
    for size, ov in PARAMS:
        mc = MultimodalChunker(size, ov)
        try:
            signal.alarm(2)
            pieces = mc._split_text_with_overlap(text) if text else []
        except _Timeout:
            pieces = None
        finally:
            signal.alarm(0)
        entry["params"].append({"size": size, "overlap": ov, "pieces": pieces})
    charslice_texts.append(entry)

charslice_blocks = []
for name, blocks in struct_cases.items():
    tbs = [
        TextBlock(content=c, page=pg, bbox=(0.0, 0.0, 1.0, 1.0))
        for c, pg in blocks
    ]
    mc = MultimodalChunker(512, 50)
    chunks = mc.create_text_chunks(tbs, "doc")
    charslice_blocks.append(
        {
            "id": name,
            "blocks": [{"text": c, "page": pg} for c, pg in blocks],
            "chunks": [
                {"content": ch.content, "page": ch.page, "chunk_index": ch.chunk_index}
                for ch in chunks
            ],
        }
    )
(OUT / "charslice_cases.json").write_text(
    json.dumps(
        {"texts": charslice_texts, "blocks": charslice_blocks}, ensure_ascii=False
    ),
    encoding="utf-8",
)

print("goldens written to", OUT)
for f in sorted(OUT.iterdir()):
    print(" ", f.name, f.stat().st_size, "bytes")
