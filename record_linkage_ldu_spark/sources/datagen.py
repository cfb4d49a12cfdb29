"""Deterministic synthetic interleaved-document generator (FIXTURES.md).

Generates the canonical input table
``documents(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``
plus ground truth (``doc_entity`` mapping and ``labeled_pairs``) — no
external data, seeded, and **distributed**: entities are generated
inside ``mapInPandas`` over ``spark.range(n_entities)``, so a bench
fixture of millions of docs never materializes on the driver and the
output is identical regardless of partitioning (each entity derives
its own RNG from (seed, entity_id)).

Duplicate families mirror the reference's data pathologies
(README.md:152-170 missingness; README.md:222 cluster sizes <= 8):
case/punctuation noise, token reorder, one-edit typos, phone/zip
reformatting, state code<->name swaps, the 'un'->'usa' country quirk
(pre_processing.py:164), fields moved to their "2" variants on
hw-source docs (exercises family-max scoring, compare_ldu_hw.py:51-59),
dropped fields, and 0-3 inert media spans.

Anchor invariant: every copy corrupts AT MOST ONE of the three anchors
{normalized name, phone digits, email} — so any two copies of an
entity share >= 1 exact anchor, every true pair is reachable by at
least one blocking key, and the reference rule masks fire (mask 4:
name==1 | email==1 | phone==1).  Hard negatives are "twin" entities
sharing a surname token + city/state (same Soundex block) with
everything else kept outside the rule thresholds.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TWIN_MOD = 13  # entity e is a hard-negative twin of e-1 when e % 13 == 1

_FIRST = (
    "james mary robert patricia john jennifer michael linda david "
    "elizabeth william barbara richard susan joseph jessica thomas "
    "sarah charles karen christopher lisa daniel nancy matthew betty "
    "anthony margaret mark sandra donald ashley steven kimberly paul "
    "emily andrew donna joshua michelle kenneth carol kevin amanda "
    "brian melissa george deborah timothy stephanie ronald rebecca "
    "edward sharon jason laura jeffrey cynthia ryan kathleen jacob amy"
).split()

_LAST = (
    "smith johnson williams brown jones garcia miller davis rodriguez "
    "martinez hernandez lopez gonzalez wilson anderson thomas taylor "
    "moore jackson martin lee perez thompson white harris sanchez "
    "clark ramirez lewis robinson walker young allen king wright "
    "scott torres nguyen hill flores green adams nelson baker hall "
    "rivera campbell mitchell carter roberts gomez phillips evans "
    "turner diaz parker cruz edwards collins reyes stewart morris"
).split()

_COMPANY_WORDS = (
    "yarn trading supply wholesale textile craft fiber knit weave "
    "thread fabric needle loom spindle wool cotton silk linen dye "
    "pattern stitch hook button ribbon canvas felt batik quilt"
).split()

_STREETS = (
    "oak maple cedar pine elm walnut chestnut birch willow magnolia "
    "oyster shell harbor lake river hill sunset meadow park main "
    "church mill spring forest garden highland valley prairie"
).split()

_STREET_SUFFIX = ("street", "st", "ave", "road", "rd", "drive", "lane", "blvd")

_CITIES = [
    ("naples", "fl", "34102"), ("miami", "fl", "33101"),
    ("orlando", "fl", "32801"), ("tampa", "fl", "33602"),
    ("austin", "tx", "78701"), ("dallas", "tx", "75201"),
    ("houston", "tx", "77002"), ("atlanta", "ga", "30303"),
    ("savannah", "ga", "31401"), ("denver", "co", "80202"),
    ("boulder", "co", "80302"), ("seattle", "wa", "98101"),
    ("spokane", "wa", "99201"), ("portland", "or", "97201"),
    ("chicago", "il", "60601"), ("springfield", "il", "62701"),
    ("boston", "ma", "02108"), ("worcester", "ma", "01601"),
    ("new york", "ny", "10001"), ("buffalo", "ny", "14201"),
    ("albany", "ny", "12207"), ("phoenix", "az", "85001"),
    ("tucson", "az", "85701"), ("nashville", "tn", "37201"),
    ("memphis", "tn", "38103"), ("raleigh", "nc", "27601"),
    ("charlotte", "nc", "28202"), ("columbus", "oh", "43215"),
    ("cleveland", "oh", "44101"), ("madison", "wi", "53703"),
]

_DOMAINS = ("example.com", "mailhost.net", "corpmail.org", "webmail.io",
            "postbox.co", "bizmail.biz")

_GROUPS = ("wholesale", "designer", "retail")

_STATE_FULL = {
    "fl": "Florida", "tx": "Texas", "ga": "Georgia", "co": "Colorado",
    "wa": "Washington", "or": "Oregon", "il": "Illinois",
    "ma": "Massachusetts", "ny": "New York", "az": "Arizona",
    "tn": "Tennessee", "nc": "North Carolina", "oh": "Ohio",
    "wi": "Wisconsin",
}

_COUNTRY_VARIANTS = ("USA", "usa", "United States", "US", "un", "U.S.A.")


def _entity_fields(entity_id: int, seed: int) -> dict:
    """Canonical (unperturbed) field values for one entity — pure
    function of (seed, entity_id)."""
    rng = random.Random((seed << 34) ^ (entity_id * 2654435761))
    first = rng.choice(_FIRST)
    last = rng.choice(_LAST)
    cword = rng.choice(_COMPANY_WORDS)
    csuf = rng.choice(("Co.", "Inc.", "LLC", "Corp."))
    is_company = rng.random() < 0.5
    city, state, zip5 = rng.choice(_CITIES)
    street_num = rng.randint(10, 9999)
    street = rng.choice(_STREETS)
    ssuf = rng.choice(_STREET_SUFFIX)
    phone = "".join(str(rng.randint(0, 9)) for _ in range(10))
    domain = rng.choice(_DOMAINS)
    company = f"{last.capitalize()} {cword.capitalize()} {csuf}"
    fields = {
        "name": company if is_company else f"{first.capitalize()} {last.capitalize()}",
        "phone": phone,
        "email": f"{first}.{last}@{domain}",
        "group": rng.choice(_GROUPS),
        "address": f"{street_num} {street.capitalize()} {ssuf.capitalize()}",
        "city": city.capitalize(),
        "state": state.upper(),
        "zip": zip5,
        "country": "USA",
    }
    if rng.random() < 0.15:  # fax ~85% missing (README.md:152-167 spirit)
        fields["fax"] = "".join(str(rng.randint(0, 9)) for _ in range(10))
    if rng.random() < 0.4:
        fields["web_site"] = f"www.{last}{cword}.com"
    return fields


def _make_twin(base: dict, entity_id: int, seed: int) -> dict:
    """Hard negative: same surname token / city / state / country as
    the base entity, but name RO < 0.7, different phone (>=4 digit
    edits), different email domain+local, different address and zip —
    below every self/cross rule threshold while still sharing the
    Soundex/sorted-neighborhood block of the base."""
    rng = random.Random((seed << 34) ^ (entity_id * 40503 + 7))
    # anchor = the token that sorts FIRST in the base's normalized name,
    # so the twin lands in the same Soundex / sorted-neighborhood block
    # (that is what makes it a *hard* negative).
    base_toks = [
        t for t in base["name"].lower().replace(".", "").replace(",", "").split()
        if t not in ("co", "corp", "inc", "company", "limited", "llc")
    ]
    anchor = min(base_toks)
    bigger = [w for w in _COMPANY_WORDS if w > anchor and w not in base_toks]
    other_word = rng.choice(bigger) if bigger else "zephyr"
    name = f"{anchor.capitalize()} {other_word.capitalize()}"
    phone = "".join(str((int(d) + rng.randint(2, 8)) % 10) for d in base["phone"])
    domain = rng.choice([d for d in _DOMAINS if d not in base["email"]])
    street_num = rng.randint(10, 9999)
    street = rng.choice([s for s in _STREETS if s not in base["address"].lower()])
    zip5 = "".join(str((int(d) + rng.randint(3, 7)) % 10) for d in base["zip"])
    return {
        "name": name,
        "phone": phone,
        "email": f"{other_word}.{anchor}@{domain}",
        "group": base["group"],
        "address": f"{street_num} {street.capitalize()} Way",
        "city": base["city"],
        "state": base["state"],
        "zip": zip5,
        "country": base["country"],
    }


def _n_copies(rng: random.Random) -> int:
    r = rng.random()
    for n, cum in ((1, 0.45), (2, 0.70), (3, 0.85), (4, 0.93), (5, 0.97), (6, 0.99)):
        if r < cum:
            return n
    return 8


def _typo(rng: random.Random, s: str) -> str:
    """One edit, never in the first two characters (keeps Soundex of
    the first token usable as a block key for the typo'd side too)."""
    if len(s) < 4:
        return s + "x"
    i = rng.randint(2, len(s) - 2)
    op = rng.random()
    if op < 0.34:
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]  # transpose
    if op < 0.67:
        return s[:i] + rng.choice("abcdefghijklmnopqrstuvwxyz") + s[i + 1:]
    return s[:i] + s[i + 1:]  # delete


def _format_phone(rng: random.Random, digits: str) -> str:
    style = rng.randint(0, 3)
    if style == 0:
        return digits
    if style == 1:
        return f"({digits[:3]}) {digits[3:6]}-{digits[6:]}"
    if style == 2:
        return f"{digits[:3]}-{digits[3:6]}-{digits[6:]}"
    return f"+1 {digits[:3]} {digits[3:6]} {digits[6:]}"


def _perturb_copy(rng: random.Random, fields: dict, source: str) -> dict:
    """One duplicate document's field values.  Corrupts at most ONE
    anchor (name/phone/email); everything else is reversible noise."""
    out = dict(fields)
    anchor_roll = rng.random()
    if anchor_roll < 0.20:  # name typo (normalized names diverge)
        out["name"] = _typo(rng, out["name"])
    elif anchor_roll < 0.30 and "email" in out:  # drop email
        del out["email"]
    elif anchor_roll < 0.38:  # drop phone
        del out["phone"]
    # reversible noise (normalizers must cancel):
    if "phone" in out:
        out["phone"] = _format_phone(rng, out["phone"])
    if rng.random() < 0.4:  # case noise
        out["name"] = out["name"].upper() if rng.random() < 0.5 else out["name"].lower()
    if rng.random() < 0.3 and "email" in out:
        out["email"] = out["email"].upper()
    if rng.random() < 0.35:  # token reorder + punctuation (sort cancels)
        toks = out["name"].replace(",", " ").split()
        rng.shuffle(toks)
        out["name"] = ", ".join(toks) if rng.random() < 0.3 else " ".join(toks)
    if rng.random() < 0.4:  # state code <-> full name
        out["state"] = _STATE_FULL.get(out["state"].lower(), out["state"])
    out["country"] = rng.choice(_COUNTRY_VARIANTS)
    if rng.random() < 0.3:  # address suffix variation (stopword-cancelled)
        for a, b in (("Street", "St."), ("Road", "Rd"), ("Ave", "Avenue")):
            if a in out["address"]:
                out["address"] = out["address"].replace(a, b)
                break
    if rng.random() < 0.25:
        del out["address"]
    if rng.random() < 0.2 and "web_site" in out:
        del out["web_site"]
    # hw-source docs may carry values in the "2"-variant kinds
    if source == "hw":
        if "phone" in out and rng.random() < 0.3:
            out["phone2"] = out.pop("phone")
        if "address" in out and rng.random() < 0.2:
            out["address3"] = out.pop("address")
        if rng.random() < 0.4:
            # company-style name also present as company_name
            out["company_name"] = out["name"]
    return out


def _doc_rows(entity_id: int, seed: int) -> list[dict]:
    """All documents (as span rows) for one entity id."""
    rng = random.Random((seed << 34) ^ (entity_id * 11400714819323198485))
    is_twin = entity_id % TWIN_MOD == 1 and entity_id > 0
    if is_twin:
        base = _entity_fields(entity_id - 1, seed)
        fields = _make_twin(base, entity_id, seed)
    else:
        fields = _entity_fields(entity_id, seed)

    rows = []
    n = _n_copies(rng)
    for copy in range(n):
        source = "ldu" if copy == 0 else rng.choice(("ldu", "hw"))
        vals = fields if copy == 0 else _perturb_copy(rng, fields, source)
        doc_id = f"d{entity_id:09d}x{copy}"
        spans = [("_source", source, "", 0)]
        off = 1
        # deterministic media interleave: 0-3 inert media spans
        media_slots = rng.sample(range(1, 8), rng.randint(0, 3))
        for k, v in sorted(vals.items()):
            if off in media_slots:
                spans.append(("media", "", f"img://{entity_id}/{off}", off))
                off += 1
            spans.append((k, str(v), "", off))
            off += 1
        rows.append(
            {
                "doc_id": doc_id,
                "entity_id": entity_id,
                "source": source,
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in spans
                ],
            }
        )
    return rows


def generate_documents(
    spark: SparkSession, n_entities: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed fixture generation.  Returns
    (doc_id, entity_id, source, spans); select doc_id+spans for the
    engine input, keep entity_id for ground truth."""
    out_schema = (
        "doc_id string, entity_id long, source string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for eid in pdf["id"]:
                rows.extend(_doc_rows(int(eid), seed))
            yield pd.DataFrame(
                rows, columns=["doc_id", "entity_id", "source", "spans"]
            )

    rng_range = spark.range(n_entities)
    if partitions:
        rng_range = rng_range.repartition(partitions)
    return rng_range.mapInPandas(gen, schema=out_schema)


def labeled_pairs(doc_entity: DataFrame) -> DataFrame:
    """Ground truth from the generator's entity assignment:
    positives = all intra-entity pairs; negatives = all pairs between a
    twin entity and its base (FIXTURES.md §2)."""
    a = doc_entity.select(
        F.col("doc_id").alias("doc_id_1"), F.col("entity_id").alias("e1")
    )
    b = doc_entity.select(
        F.col("doc_id").alias("doc_id_2"), F.col("entity_id").alias("e2")
    )
    pos = (
        a.join(b, F.col("e1") == F.col("e2"))
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .select("doc_id_1", "doc_id_2", F.lit(True).alias("is_match"))
    )
    twin = (
        a.join(
            b,
            (F.col("e2") == F.col("e1") + 1)
            & ((F.col("e1") + 1) % TWIN_MOD == 1),
        )
        .select(
            F.least("doc_id_1", "doc_id_2").alias("doc_id_1"),
            F.greatest("doc_id_1", "doc_id_2").alias("doc_id_2"),
            F.lit(False).alias("is_match"),
        )
    )
    return pos.unionByName(twin)


def expected_clusters(doc_entity: DataFrame) -> DataFrame:
    """Golden clustering: cluster label = min doc_id per entity, with
    twin entities their own clusters (FIXTURES.md §3)."""
    from pyspark.sql.window import Window

    return doc_entity.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("entity_id")).alias("cluster_id"),
    )
