"""Template vocabulary for fixture transcripts (FIXTURES.md §1/§2).

Written independently of the engine's lexicons (no imports). The word
inventories below were curated so that:
- CLEAN words carry no offensive/targeting signal (disjointness from the
  engine's lexicons is asserted by tests/test_fixture_hygiene.py — the
  TEST may import both sides, the generators may not);
- insult/target words are common-register English any reasonable
  offensive-language lexicon covers.
"""

from __future__ import annotations

# Words with no offensive or targeting meaning (fixture "clean register").
CLEAN_WORDS = (
    "the morning light came through the tall green field and we walked along "
    "the river after soft rain small birds sang near the old stone house "
    "children played under warm trees while water moved slowly a good day "
    "for reading a long story by the fire she found a letter inside the "
    "wooden box and they cooked dinner together as the evening sky turned "
    "gold over the quiet hill the new teacher explained the lesson with "
    "clear examples the garden grew every spring friends met at the market "
    "to share bread and fresh fruit"
).split()

CLEAN_SENTENCES = (
    "the morning light came through the tall green field",
    "we walked along the river after the soft rain",
    "small birds sang near the old stone house at first light",
    "children played under the warm trees while the water moved slowly",
    "a good day for reading a long story by the fire",
    "she found a letter inside the old wooden box",
    "they cooked dinner together as the evening sky turned gold",
    "the new teacher explained the lesson with clear examples",
    "the garden grew well every spring after the rain",
    "friends met at the market to share bread and fresh fruit",
    "the quiet hill turned gold under the evening light",
    "we heard soft music along the river in the morning",
)

# Insult register — subset of any common offensive-language lexicon.
INSULTS = (
    "idiot",
    "stupid",
    "moron",
    "pathetic",
    "trash",
    "garbage",
    "loser",
    "clown",
    "dumb",
    "worthless",
    "jerk",
    "foolish",
    "scum",
    "disgusting",
)

# Targets: groups of people (→ GRP)
GROUP_TARGETS = (
    "fans",
    "voters",
    "politicians",
    "drivers",
    "tourists",
    "neighbors",
    "journalists",
    "managers",
    "customers",
    "employees",
)

# Targets: non-person entities (→ OTH)
ENTITY_TARGETS = (
    "company",
    "government",
    "movie",
    "app",
    "airline",
    "policy",
    "show",
    "brand",
    "platform",
    "service",
)

# Untargeted-offense carriers (no second person, no group/entity target).
UNT_TEMPLATES = (
    "what a {ins} mess this turned out to be",
    "such a {ins} waste of a fine morning",
    "that was a truly {ins} thing to watch",
    "honestly the most {ins} nonsense i have ever seen",
    "a completely {ins} way to end the day",
)

IND_TEMPLATES = (
    "@{handle} you are a complete {ins}",
    "you are such a {ins} and everybody can see it",
    "@{handle} you {ins} stay away from my work",
    "only a {ins} like you would say that",
)

GRP_TEMPLATES = (
    "those {grp} are nothing but {ins} fools",
    "all the {grp} in this town are {ins}",
    "the {grp} keep acting like {ins} clowns",
    "typical {grp} always so {ins} about it",
)

OTH_TEMPLATES = (
    "this {ent} is absolute {ins} garbage",
    "the whole {ent} is a {ins} joke",
    "what a {ins} excuse for a {ent}",
    "that {ent} keeps getting more {ins} every year",
)

TOXIC_TEMPLATES = (
    "stupid worthless trash everywhere just stupid garbage",
    "pathetic disgusting garbage from a worthless clown",
    "dumb foolish trash and more dumb moron garbage",
)

# English-orthography pseudo-words: readable as English (so they pass a
# char-level language gate) but out-of-vocabulary for any word LM — the
# "boilerplate gibberish / high perplexity" stratum of FIXTURES.md §1.
PSEUDO_WORDS = (
    "mobrit kelpar wintrall fablemor pring harblit gliman trubeck plimbor "
    "drathis crunda dunsting crundle blathering clompton wrenlit shimbled "
    "thrumple glistering stroval"
).split()

SHORT_TEXTS = ("ok", "no", "yes", "hm", "go", "fine", "sure")

# Non-English common-word inventories (accented forms kept — they are the
# langid signal).
FOREIGN_WORDS = {
    "es": (
        "el la de que y en los se del las por un para con no una su es lo "
        "como pero sus ya este porque esta entre cuando muy sin sobre "
        "también hasta donde desde todo durante casa vida mundo ciudad agua "
        "tiempo ahora siempre aquí bueno nuevo grande hacer tener decir "
        "saber querer hablar mañana noche gracias corazón año días"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat sie nach wird bei "
        "einer um am sind noch wie über einen so zum war haben nur oder "
        "aber vor durch man sein wurde jahr zeit leben welt stadt wasser "
        "straße mädchen später zwischen immer wieder sehr heute schön groß"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du "
        "elle au cette pour pas vous par sur faire plus dire nous comme "
        "mais avec tout aller voir bien sans leur homme deux vouloir femme "
        "venir quand grand notre jour prendre même votre rien petit encore "
        "aussi temps chose vie après très déjà français année monde ville "
        "nuit cœur merci bonjour était"
    ).split(),
    "zh": (
        "de shi bu wo ni ta men zhe ge zai you le ren dou yi hao ma shuo "
        "jiu na yao hui dui ye hen tian shang xia zhong guo jia xiao da "
        "lai qu kan xiang zhi dao xue sheng gong zuo jian nian yue ri "
        "ming bai qian wan shui shan feng yu hua peng lao shi tong xie"
    ).split(),
    "tr": (
        "bir bu da de ve için ile mi ne o çok daha en gibi kadar sonra ama "
        "ben biz siz onlar var yok evet şey zaman gün yıl iyi kötü büyük "
        "küçük yeni eski güzel şu her hiç şimdi burada orada nasıl neden "
        "çünkü işte türkçe üzerinde arasında değil olarak olan oldu ev su"
    ).split(),
}

HANDLES = ("dave123", "sam_w", "alex99", "kim_h", "lee42", "pat7")

PII_ITEMS = (
    # (raw, placeholder)
    ("liam.brown@example.org", "<EMAIL>"),
    ("support@mail-example.net", "<EMAIL>"),
    ("555-123-4567", "<PHONE>"),
    ("(212) 555-0182", "<PHONE>"),
    ("5551230199", "<PHONE>"),
    ("123-45-6789", "<SSN>"),
    ("192.168.0.1", "<IP>"),
    ("10.0.0.254", "<IP>"),
    ("https://example.com/page", "URL"),
    ("www.example-site.com", "URL"),
)
