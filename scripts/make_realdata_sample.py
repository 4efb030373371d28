"""Generate the committed realdata mini-slice (tests/data/realdata_sample/).

SYNTHETIC CONTENT, REAL FORMATS: the files replicate the published
LongMemEval (JSON array + gzipped JSONL) and LoCoMo (locomo10.json)
schemas exactly — per-entry keys, parallel haystack arrays, dia_id
evidence pointers — so the REAL loaders and the ranking harness run
end-to-end in CI instead of skipping until a dataset lands. Content is
deterministic (seeded) and engineered so gold sessions share rare topic
tokens with their questions — the hash embedder then has genuine
retrieval signal and R@K is meaningfully > 0.

Run:  python scripts/make_realdata_sample.py   (idempotent)
"""

from __future__ import annotations

import gzip
import json
import os
import random

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "realdata_sample",
)

TOPICS = [
    "kubernetes ingress", "sourdough starter", "marathon taper",
    "tax deduction", "guitar tuning", "espresso grind", "visa renewal",
    "solar inverter", "cat allergy", "novel outline", "tile grout",
    "piano recital", "bonsai pruning", "kayak roll", "chess opening",
    "compost ratio", "telescope mount", "knee rehab", "salsa footwork",
    "budget spreadsheet", "wifi mesh", "pasta hydration", "car battery",
    "resume format", "garden irrigation", "ski wax", "photo backup",
    "standing desk", "language flashcards", "fermented hot sauce",
    "bike chain", "home theater", "interview prep", "dog training",
    "watercolor palette", "rock climbing grip", "meal prep", "3d printer bed",
    "sewing machine tension", "aquarium ph", "podcast microphone",
    "succulent watering", "typing speed", "barbecue brine", "camping stove",
    "violin bow", "mortgage refinance", "surf forecast", "pottery glaze",
    "drone calibration",
]

FILLER = (
    "we talked about the weather and weekend plans",
    "general chit chat about movies and shows",
    "scheduling notes and reminders for next week",
    "random thoughts on books and podcasts",
)


def make_longmem(rng: random.Random) -> list[dict]:
    # 60 reusable sessions: one gold per topic + 10 pure-decoy sessions
    sess_turns: dict[str, list[dict]] = {}
    for i, topic in enumerate(TOPICS):
        sid = f"s_{i:03d}"
        sess_turns[sid] = [
            {"role": "user", "content": f"let's figure out my {topic} problem"},
            {
                "role": "assistant",
                "content": f"for {topic} the decision was option_{i:03d} "
                           f"because of {topic.split()[0]} constraints",
            },
            {"role": "user", "content": rng.choice(FILLER)},
        ]
    for j in range(10):
        sid = f"d_{j:03d}"
        sess_turns[sid] = [
            {"role": "user", "content": rng.choice(FILLER)},
            {"role": "assistant", "content": rng.choice(FILLER)},
        ]
    items = []
    all_sids = sorted(sess_turns)
    for i, topic in enumerate(TOPICS):
        gold = f"s_{i:03d}"
        decoys = rng.sample([s for s in all_sids if s != gold], 9)
        hay = [gold] + decoys
        rng.shuffle(hay)
        items.append(
            {
                "question_id": f"q_{i:03d}",
                "question_type": rng.choice(
                    ["single-session-user", "multi-session", "temporal-reasoning"]
                ),
                "question": f"what was decided about the {topic} issue",
                "answer": f"option_{i:03d}",
                "question_date": "2023/05/20 (Sat) 02:21",
                "haystack_session_ids": hay,
                "haystack_dates": ["2023/05/20 (Sat) 02:21"] * len(hay),
                "haystack_sessions": [sess_turns[s] for s in hay],
                "answer_session_ids": [gold],
            }
        )
    return items


def make_locomo(rng: random.Random) -> list[dict]:
    convs = []
    for c in range(3):
        conversation: dict = {"speaker_a": "Alice", "speaker_b": "Bob"}
        qa = []
        for s in range(1, 5):
            turns = []
            for t in range(8):
                dia = f"D{s}:{t + 1}"
                topic = TOPICS[(c * 16 + (s - 1) * 4 + t) % len(TOPICS)]
                text = (
                    f"my {topic} update is milestone_{c}_{s}_{t}"
                    if t % 2 == 0
                    else rng.choice(FILLER)
                )
                turns.append(
                    {
                        "speaker": "Alice" if t % 2 == 0 else "Bob",
                        "dia_id": dia,
                        "text": text,
                    }
                )
            conversation[f"session_{s}"] = turns
            conversation[f"session_{s}_date_time"] = "1:00 pm on 8 May, 2023"
        for k in range(5):
            s = (k % 4) + 1
            t = (k * 2) % 8
            topic = TOPICS[(c * 16 + (s - 1) * 4 + t) % len(TOPICS)]
            qa.append(
                {
                    "question": f"what milestone did alice report for {topic}",
                    "answer": f"milestone_{c}_{s}_{t}",
                    "evidence": [f"D{s}:{t + 1}"],
                    "category": 2,
                }
            )
        convs.append({"sample_id": f"conv-{c}", "qa": qa, "conversation": conversation})
    return convs


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20260815)
    items = make_longmem(rng)
    with open(os.path.join(OUT, "longmemeval_s_sample.json"), "w") as f:
        json.dump(items, f, indent=1)
    with gzip.open(
        os.path.join(OUT, "longmemeval_sample.jsonl.gz"), "wt"
    ) as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    with open(os.path.join(OUT, "locomo_sample.json"), "w") as f:
        json.dump(make_locomo(rng), f, indent=1)
    print("wrote", sorted(os.listdir(OUT)))


if __name__ == "__main__":
    main()
