"""Generate tests/data/mini_beir: a format-exact miniature BEIR drop.

Round-4 item 6 (real-data readiness): when an MS MARCO/BEIR data drop
lands, quality numbers should be minutes away — so the exact on-disk
format the loaders expect is pinned by a checked-in fixture today:

    corpus.jsonl      {"_id", "title", "text", "metadata"}  (BEIR field set)
    queries.jsonl     {"_id", "text", "metadata"}
    qrels/test.tsv    BEIR 3-column with header (query-id, corpus-id, score)
    qrels/dev.tsv     TREC 4-column, no header (qid, iter, docid, rel) —
                      the MS MARCO qrels layout

Content is synthetic (no licensing concerns) but STRUCTURED: 16 topics,
each with on-topic docs at two relevance grades plus off-topic noise
docs, so recall/MRR/nDCG sit strictly inside (0, 1) and respond to
ranking changes.  Deterministic: re-running this script reproduces the
fixture byte-for-byte.

Run: python scripts/make_mini_beir_fixture.py  (writes tests/data/mini_beir)
"""

from __future__ import annotations

import json
import os

import numpy as np

TOPICS = [
    ("solar panels", ["photovoltaic", "silicon", "inverter", "rooftop",
                      "irradiance", "grid", "watt"]),
    ("coral reefs", ["polyp", "bleaching", "symbiotic", "calcium",
                     "lagoon", "biodiversity", "algae"]),
    ("sourdough bread", ["starter", "fermentation", "hydration", "crumb",
                         "levain", "gluten", "proofing"]),
    ("electric cars", ["battery", "charging", "range", "motor",
                       "regenerative", "lithium", "torque"]),
    ("honey bees", ["hive", "pollen", "queen", "nectar", "waggle",
                    "colony", "apiary"]),
    ("glaciers", ["moraine", "crevasse", "ablation", "icefall",
                  "firn", "calving", "meltwater"]),
    ("espresso", ["portafilter", "crema", "tamping", "extraction",
                  "grind", "barista", "pressure"]),
    ("volcanoes", ["magma", "caldera", "eruption", "basalt",
                   "pyroclastic", "vent", "lava"]),
    ("marathon training", ["tempo", "intervals", "taper", "cadence",
                           "fartlek", "pace", "mileage"]),
    ("jazz improvisation", ["chord", "swing", "bebop", "phrasing",
                            "comping", "chorus", "scale"]),
    ("beekeeping suits", ["veil", "sting", "canvas", "gloves",
                          "zipper", "mesh", "protection"]),
    ("tidal energy", ["turbine", "estuary", "ebb", "barrage",
                      "current", "generator", "flow"]),
    ("fermented tea", ["kombucha", "scoby", "brewing", "culture",
                       "sweetened", "bottling", "fizz"]),
    ("mountain weather", ["foehn", "whiteout", "windchill", "front",
                          "barometer", "gust", "forecast"]),
    ("ancient rome", ["aqueduct", "legion", "forum", "senate",
                      "consul", "villa", "mosaic"]),
    ("deep sea fish", ["bioluminescent", "abyssal", "anglerfish", "trench",
                       "pressure", "photophore", "plankton"]),
]

FILLER = ("the of a and to in is that it for on with as are this be "
          "about from which more when there also some other").split()


def doc_text(rng, words, n=40):
    toks = []
    for _ in range(n):
        if rng.random() < 0.45:
            toks.append(words[rng.integers(len(words))])
        else:
            toks.append(FILLER[rng.integers(len(FILLER))])
    return " ".join(toks)


def main(root="tests/data/mini_beir"):
    rng = np.random.default_rng(2026)
    os.makedirs(os.path.join(root, "qrels"), exist_ok=True)
    docs, qrels = [], {}
    did = 0
    for t, (topic, vocab) in enumerate(TOPICS):
        qid = f"q{t}"
        qrels[qid] = {}
        # 4 highly relevant (grade 2): topic phrase + dense topic vocab
        for _ in range(4):
            _id = f"d{did}"
            docs.append({"_id": _id,
                         "title": f"{topic} overview {did}",
                         "text": f"{topic} " + doc_text(rng, vocab, 45),
                         "metadata": {}})
            qrels[qid][_id] = 2
            did += 1
        # 4 partially relevant (grade 1): some topic vocab, no phrase
        for _ in range(4):
            _id = f"d{did}"
            docs.append({"_id": _id,
                         "title": f"notes {did}",
                         "text": doc_text(rng, vocab[:3], 40),
                         "metadata": {}})
            qrels[qid][_id] = 1
            did += 1
        # 12 noise docs: other topics' vocab + filler
        for _ in range(12):
            other = TOPICS[rng.integers(len(TOPICS))][1]
            _id = f"d{did}"
            docs.append({"_id": _id,
                         "title": f"misc {did}",
                         "text": doc_text(rng, other, 35),
                         "metadata": {}})
            did += 1

    with open(os.path.join(root, "corpus.jsonl"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    with open(os.path.join(root, "queries.jsonl"), "w") as f:
        for t, (topic, vocab) in enumerate(TOPICS):
            if t % 2 == 0:
                text = f"{topic} {vocab[0]} {vocab[1]}"
            else:
                # hard queries: no topic phrase, and the terms overlap the
                # grade-1 docs' vocabulary (vocab[:3]) — so partially
                # relevant docs genuinely compete with grade-2 docs and
                # the metrics sit strictly inside (0, 1): a ranking
                # regression moves them (a saturated fixture cannot)
                text = f"{vocab[1]} {vocab[2]} {vocab[5]}"
            f.write(json.dumps({"_id": f"q{t}", "text": text,
                                "metadata": {}}) + "\n")
    # BEIR 3-col with header
    with open(os.path.join(root, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for qid, rels in qrels.items():
            for did_, s in rels.items():
                f.write(f"{qid}\t{did_}\t{s}\n")
    # TREC/MS MARCO 4-col, no header (same judgments; pins the 4-col path)
    with open(os.path.join(root, "qrels", "dev.tsv"), "w") as f:
        for qid, rels in qrels.items():
            for did_, s in rels.items():
                f.write(f"{qid}\t0\t{did_}\t{s}\n")
    print(f"wrote {len(docs)} docs, {len(TOPICS)} queries, "
          f"{sum(len(r) for r in qrels.values())} judgments -> {root}")


if __name__ == "__main__":
    main()
