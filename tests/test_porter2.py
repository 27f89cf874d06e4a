"""Golden vectors pinning the Porter2 stemmer byte-for-byte
(SURVEY.md §5.1, §7 'Porter2 byte-fidelity')."""

from rechercheinfoweb_spark.functions.porter2 import stem

GOLDEN = {
    # snowball english sample behaviour
    "running": "run", "runner": "runner", "runs": "run",
    "consign": "consign", "consigned": "consign",
    "consigning": "consign", "consignment": "consign",
    "flies": "fli", "ties": "tie", "cries": "cri",
    "skies": "sky", "sky": "sky", "dying": "die", "lying": "lie",
    "news": "news", "atlas": "atlas", "cosmos": "cosmos",
    "inning": "inning", "proceed": "proceed", "exceed": "exceed",
    "happy": "happi", "happily": "happili",
    "national": "nation", "rational": "ration", "relational": "relat",
    "generously": "generous", "generation": "generat",
    "generate": "generat", "general": "general",
    "communication": "communic", "communism": "communism",
    "arsenal": "arsenal",
    "conditional": "condit", "beautiful": "beauti",
    "hopping": "hop", "hoping": "hope", "hoped": "hope",
    "agreed": "agre", "falling": "fall", "arguing": "argu",
    "replacement": "replac", "adjustable": "adjust",
    "dependent": "depend", "activate": "activ", "bowling": "bowl",
    "connection": "connect", "connected": "connect",
    "connecting": "connect", "connections": "connect",
    "ugly": "ugli", "early": "earli", "only": "onli",
    "singly": "singl", "gently": "gentl", "idly": "idl",
    # apostrophes (step 0)
    "boy's": "boy", "boys'": "boy", "girl's'": "girl",
    # sses / ss / us
    "possesses": "possess", "possess": "possess", "census": "census",
    # short-word passthrough (callers gate at len>3 anyway)
    "a": "a", "be": "be", "sky": "sky",
    # y-handling
    "youth": "youth", "boyishly": "boyish",
}


def test_golden_vectors():
    bad = {w: (stem(w), want) for w, want in GOLDEN.items()
           if stem(w) != want}
    assert not bad, f"stemmer drift: {bad}"


def test_mixed_case_deterministic():
    # no case folding (reference never lowercases); uppercase tokens
    # pass through the lowercase-only algorithm deterministically
    for w in ("Running", "BM25", "UPPER", "MiXeD"):
        assert stem(w) == stem(w)
    assert stem("BM25") == "BM25"
