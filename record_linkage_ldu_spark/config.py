"""Frozen configuration: stopword corpora, lookup tables, scoring model.

Everything here is compiled to literals at build time (SURVEY.md §2.3
F8) so the Spark expression chains and the DuckDB oracle SQL share one
source of truth.  Semantics follow the reference:

  * stopword corpus construction: /root/reference/pre_processing.py:14-29
    (NLTK english list + '&', minus the 51 US state codes; address and
    name extras appended).
  * US state canonicalization:    pre_processing.py:32-37
  * country canonicalization:     pre_processing.py:40-45,164-168
  * field comparison methods:     compare_ldu_hw.py:66-76,
                                  compare_ldu_ldu.py:28-40
  * cross-dataset field mapping:  compare_ldu_hw.py:27-48
  * field-family merge (max):     compare_ldu_hw.py:51-59
  * combined-score weights:       main_ldu_hw.py:340-363 (identical in
                                  main_ldu_ldu.py:200-223)

The NLTK English stopword list is public, stable content
(nltk_data corpora/stopwords/english); it is frozen here because the
package must not depend on NLTK at runtime.
"""

from __future__ import annotations

# --------------------------------------------------------------------
# Stopword corpora (reference: pre_processing.py:14-29)
# --------------------------------------------------------------------

# NLTK english stopwords (179 entries, frozen).  Contractions keep
# their apostrophes here for fidelity; they can never match a token in
# practice because normalization strips non-alphanumerics first.
NLTK_ENGLISH_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
)

# The 51 US state codes (incl. DC) that must survive as tokens
# (pre_processing.py:16-18).
US_STATE_CODES: tuple[str, ...] = (
    "ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de", "fl", "ga",
    "hi", "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me",
    "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm",
    "nv", "ny", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "va", "vt", "wa", "wi", "wv", "wy",
)

# all_stopwords = english + '&' - state codes (pre_processing.py:14-25)
BASE_STOPWORDS: tuple[str, ...] = tuple(
    w for w in (*NLTK_ENGLISH_STOPWORDS, "&") if w not in set(US_STATE_CODES)
)

# address_stopwords / name_stopwords (pre_processing.py:28-29)
ADDRESS_STOPWORDS: tuple[str, ...] = BASE_STOPWORDS + (
    "street", "st", "place", "rd", "road", "square", "ave",
)
NAME_STOPWORDS: tuple[str, ...] = BASE_STOPWORDS + (
    "co", "corp", "inc", "company", "limited", "llc",
)

# --------------------------------------------------------------------
# US state canonicalization (pre_processing.py:32-37; `us` package
# semantics: code-or-name lookup -> full lowercase name, miss keeps
# the input).
# --------------------------------------------------------------------

US_STATES: dict[str, str] = {
    "al": "alabama", "ak": "alaska", "az": "arizona", "ar": "arkansas",
    "ca": "california", "co": "colorado", "ct": "connecticut",
    "de": "delaware", "dc": "district of columbia", "fl": "florida",
    "ga": "georgia", "hi": "hawaii", "id": "idaho", "il": "illinois",
    "in": "indiana", "ia": "iowa", "ks": "kansas", "ky": "kentucky",
    "la": "louisiana", "me": "maine", "md": "maryland",
    "ma": "massachusetts", "mi": "michigan", "mn": "minnesota",
    "ms": "mississippi", "mo": "missouri", "mt": "montana",
    "ne": "nebraska", "nv": "nevada", "nh": "new hampshire",
    "nj": "new jersey", "nm": "new mexico", "ny": "new york",
    "nc": "north carolina", "nd": "north dakota", "oh": "ohio",
    "ok": "oklahoma", "or": "oregon", "pa": "pennsylvania",
    "ri": "rhode island", "sc": "south carolina", "sd": "south dakota",
    "tn": "tennessee", "tx": "texas", "ut": "utah", "vt": "vermont",
    "va": "virginia", "wa": "washington", "wv": "west virginia",
    "wi": "wisconsin", "wy": "wyoming",
}

# lookup key -> canonical full name; keys are lowercase codes AND
# lowercase full names (the `us` package matches either).
STATE_LOOKUP: dict[str, str] = {
    **US_STATES,
    **{v: v for v in US_STATES.values()},
}

# --------------------------------------------------------------------
# Country canonicalization (pre_processing.py:40-45).  The reference
# uses country_converter's 'name_short'; we freeze a pragmatic alias
# table (ISO2/ISO3/common aliases -> lowercase short name) covering the
# values the synthetic fixtures and TPC-H nation table produce, with
# keep-original-on-miss semantics.  'un' -> 'usa' is applied BEFORE the
# lookup (pre_processing.py:164,166), and 'usa' then canonicalizes to
# 'united states'.
# --------------------------------------------------------------------

COUNTRY_ALIASES: dict[str, str] = {
    # united states
    "us": "united states", "usa": "united states",
    "u.s.": "united states", "u.s.a.": "united states",
    "united states": "united states",
    "united states of america": "united states",
    "america": "united states",
    # canada / mexico
    "ca": "canada", "can": "canada", "canada": "canada",
    "mx": "mexico", "mex": "mexico", "mexico": "mexico",
    # united kingdom
    "uk": "united kingdom", "gb": "united kingdom",
    "gbr": "united kingdom", "united kingdom": "united kingdom",
    "great britain": "united kingdom",
    # europe
    "fr": "france", "fra": "france", "france": "france",
    "de": "germany", "deu": "germany", "germany": "germany",
    "deutschland": "germany",
    "es": "spain", "esp": "spain", "spain": "spain",
    "it": "italy", "ita": "italy", "italy": "italy",
    "nl": "netherlands", "nld": "netherlands",
    "netherlands": "netherlands", "holland": "netherlands",
    "ro": "romania", "rou": "romania", "romania": "romania",
    "ru": "russia", "rus": "russia", "russia": "russia",
    "russian federation": "russia",
    # TPC-H nations + common others
    "algeria": "algeria", "argentina": "argentina", "brazil": "brazil",
    "br": "brazil", "bra": "brazil",
    "canada ": "canada", "egypt": "egypt", "ethiopia": "ethiopia",
    "india": "india", "in": "india", "ind": "india",
    "indonesia": "indonesia", "iran": "iran", "iraq": "iraq",
    "japan": "japan", "jp": "japan", "jpn": "japan",
    "jordan": "jordan", "kenya": "kenya",
    "morocco": "morocco", "mozambique": "mozambique", "peru": "peru",
    "china": "china", "cn": "china", "chn": "china",
    "saudi arabia": "saudi arabia", "vietnam": "vietnam",
    "australia": "australia", "au": "australia", "aus": "australia",
}

# --------------------------------------------------------------------
# Field comparison model (compare_ldu_hw.py:66-76 / compare_ldu_ldu.py:28-40)
# --------------------------------------------------------------------

# similarity method per field family: 'ro' = Ratcliff-Obershelp
# (sequence based), 'lev' = normalized Levenshtein (edit based).
COMPARE_METHOD: dict[str, str] = {
    "email": "ro",
    "web_site": "ro",
    "name": "ro",
    "address": "ro",
    "city": "lev",
    "state": "lev",
    "zip": "lev",
    "country": "lev",
    "phone": "lev",
    "fax": "lev",
    "group": "lev",
}

# cross-dataset (hw -> ldu) field mapping (compare_ldu_hw.py:27-48)
HW_TO_LDU: dict[str, tuple[str, ...]] = {
    "email": ("email",),
    "company_name": ("name",),
    "name": ("name",),
    "name2": ("name",),
    "group": ("group",),
    "phone": ("phone", "fax"),
    "address": ("address",),
    "address2": ("address",),
    "city": ("city",),
    "state": ("state",),
    "zip": ("zip",),
    "country": ("country",),
    "phone2": ("phone", "fax"),
    "address3": ("address",),
    "address4": ("address",),
    "city2": ("city",),
    "state2": ("state",),
    "zip2": ("zip",),
    "country2": ("country",),
    "phone3": ("phone", "fax"),
}

# field-family merge: final score = max over members (compare_ldu_hw.py:51-59)
PROPERTY_MERGE: dict[str, tuple[str, ...]] = {
    "name": ("name", "name2"),
    "address": ("address", "address2", "address3", "address4"),
    "city": ("city", "city2"),
    "state": ("state", "state2"),
    "zip": ("zip", "zip2"),
    "country": ("country", "country2"),
    "phone": ("phone", "phone2", "phone3"),
}

# which comparison method applies to a (possibly suffixed) column name:
# the reference matches by substring (compare_ldu_hw.py:98-101), e.g.
# 'company_name' and 'name2' both hit 'name' -> Ratcliff-Obershelp.
def method_for_field(col: str) -> str | None:
    for key, method in COMPARE_METHOD.items():
        if key in col:
            return method
    return None


# --------------------------------------------------------------------
# Combined (Fellegi-Sunter-style) score: thresholded weighted sum.
# score = sum_f  s_f * multiplier[f] * [s_f >= threshold[f]]
# (main_ldu_hw.py:330-382; LDU-LDU drops company_name,
#  main_ldu_ldu.py:225-233)
# --------------------------------------------------------------------

SCORE_THRESHOLDS: dict[str, float] = {
    "email": 0.5, "company_name": 0.0, "group": 0.25, "phone": 0.25,
    "city": 0.5, "state": 0.5, "zip": 0.0, "country": 0.5,
    "name": 0.0, "address": 0.0,
}

SCORE_MULTIPLIERS: dict[str, float] = {
    "email": 1.0, "company_name": 1.0, "group": 0.1, "phone": 1.0,
    "city": 0.5, "state": 0.25, "zip": 1.0, "country": 0.25,
    "name": 1.0, "address": 1.0,
}

# fields entering the combined score per pipeline mode
CROSS_SCORE_FIELDS: tuple[str, ...] = (
    "email", "company_name", "group", "phone", "city", "state", "zip",
    "country", "name", "address",
)
SELF_SCORE_FIELDS: tuple[str, ...] = (
    "email", "group", "phone", "city", "state", "zip", "country",
    "name", "address",
)

# column sets for cross-dataset scoring: every HW-side variant column
# (left) and every LDU-side target column reachable through HW_TO_LDU
# (right) — what attach_pair_sides must carry into the pair rows.
CROSS_HW_FIELDS: tuple[str, ...] = tuple(HW_TO_LDU.keys())
CROSS_LDU_FIELDS: tuple[str, ...] = (
    "email", "name", "group", "phone", "fax", "address", "city",
    "state", "zip", "country",
)

# fields compared in self-dedup mode (compare_ldu_ldu.py:28-40; the ldu
# table's linkage-relevant columns)
SELF_COMPARE_FIELDS: tuple[str, ...] = (
    "name", "phone", "fax", "email", "group", "address", "city",
    "state", "zip", "country", "web_site",
)

# span `kind` vocabulary for the documents table (FIXTURES.md §1)
SPAN_FIELD_KINDS: tuple[str, ...] = (
    "name", "company_name", "name2", "phone", "phone2", "phone3",
    "fax", "email", "group", "address", "address2", "address3",
    "address4", "city", "city2", "state", "state2", "zip", "zip2",
    "country", "country2", "web_site",
)
SOURCE_KIND = "_source"
MEDIA_KIND = "media"

# normalizer assignment per canonical field (pre_processing.py:176-212)
FIELD_NORMALIZER: dict[str, str] = {
    "name": "name", "company_name": "name", "name2": "name",
    "group": "name",
    "phone": "number", "phone2": "number", "phone3": "number",
    "fax": "number", "zip": "number", "zip2": "number",
    "email": "email", "web_site": "website",
    "address": "address", "address2": "address", "address3": "address",
    "address4": "address",
    "city": "address", "city2": "address",
    "state": "state_then_address", "state2": "state_then_address",
    "country": "country_then_address", "country2": "country_then_address",
}

# ------------------------------------------------------------------
# Nickname / diminutive dictionary (given-name canonicalization)
# ------------------------------------------------------------------
# variant -> canonical formal name, covering the fixture's given-name
# vocabulary (sources/datagen.py::_FIRST) plus its common English
# diminutives.  A frozen literal like the stopword corpora: both
# engines compile the SAME map, so canonicalization is hash-checkable.
# At 10^12 docs this stays a ~100-entry expression-level literal map
# (no join, no broadcast table needed); a tenant-supplied dictionary
# of thousands of rows would swap in as a broadcast join with the
# same output contract.
NICKNAME_ALIASES: dict[str, str] = {
    "jim": "james", "jimmy": "james", "jamie": "james",
    "bob": "robert", "rob": "robert", "bobby": "robert",
    "robbie": "robert", "bert": "robert",
    "pat": "patricia", "patty": "patricia", "trish": "patricia",
    "jack": "john", "johnny": "john",
    "jen": "jennifer", "jenny": "jennifer",
    "mike": "michael", "mick": "michael", "mickey": "michael",
    "dave": "david", "davey": "david",
    "liz": "elizabeth", "beth": "elizabeth", "betsy": "elizabeth",
    "eliza": "elizabeth", "betty": "elizabeth",
    "bill": "william", "billy": "william", "will": "william",
    "willy": "william", "liam": "william",
    "barb": "barbara",
    "rick": "richard", "ricky": "richard", "dick": "richard",
    "rich": "richard", "richie": "richard",
    "sue": "susan", "susie": "susan",
    "joe": "joseph", "joey": "joseph",
    "jess": "jessica",
    "tom": "thomas", "tommy": "thomas",
    "sally": "sarah",
    "charlie": "charles", "chuck": "charles", "chas": "charles",
    "chris": "christopher", "topher": "christopher",
    "dan": "daniel", "danny": "daniel",
    "matt": "matthew", "matty": "matthew",
    "tony": "anthony",
    "maggie": "margaret", "meg": "margaret", "peggy": "margaret",
    "marge": "margaret",
    "sandy": "sandra",
    "don": "donald", "donnie": "donald",
    "steve": "steven", "stevie": "steven",
    "kim": "kimberly",
    "andy": "andrew", "drew": "andrew",
    "josh": "joshua",
    "shelly": "michelle",
    "ken": "kenneth", "kenny": "kenneth",
    "mandy": "amanda",
    "mel": "melissa",
    "deb": "deborah", "debbie": "deborah",
    "tim": "timothy", "timmy": "timothy",
    "steph": "stephanie",
    "ron": "ronald", "ronnie": "ronald",
    "becky": "rebecca", "becca": "rebecca",
    "ed": "edward", "eddie": "edward", "ted": "edward",
    "teddy": "edward", "ned": "edward",
    "jay": "jason",
    "jeff": "jeffrey",
    "cindy": "cynthia",
    "kathy": "kathleen", "kate": "kathleen", "katie": "kathleen",
    "jake": "jacob",
}
