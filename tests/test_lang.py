from hybridgl_tpu.lang import HeuristicParser, get_parser


def test_heuristic_basic():
    p = HeuristicParser()
    out = p.parse("The red car behind the truck")
    assert out.noun_phrase == "red car"
    assert out.head_noun == "car"
    assert out.other_noun_phrases == ["truck"]
    assert out.nouns == ["truck"]
    assert out.rela_flag == "up"  # 'behind' is in UP_KEYWORDS (utils.py:201)
    assert out.dir_flag == "none"


def test_heuristic_direction_and_left_relation():
    p = HeuristicParser()
    out = p.parse("man on the left")
    assert out.dir_flag == "left"
    assert out.rela_flag == "left"
    assert out.noun_phrase == "man"
    assert not out.has_other_nouns  # 'left' chunk filtered as relation word


def test_rela_right_bug_compat():
    # the reference compares token.text == RIGHT_KEYWORDS (a set), so the
    # "right" relation flag never fires (utils.py:219); dir flag still does.
    buggy = HeuristicParser(rela_right_bug=True)
    fixed = HeuristicParser(rela_right_bug=False)
    s = "woman to the right of the dog"
    assert buggy.parse(s).rela_flag != "right"
    assert fixed.parse(s).rela_flag == "right"
    assert buggy.parse(s).dir_flag == "right"


def test_null_keyword_suppresses_relation():
    p = HeuristicParser()
    out = p.parse("the left half of the picture")
    # 'picture' in NULL_KEYWORDS -> relation flag forced to none (utils.py:209)
    assert out.rela_flag == "none"


def test_big_small_flags():
    p = HeuristicParser()
    assert p.parse("the bigger elephant").rela_flag == "big"
    assert p.parse("smaller cup next to the plate").rela_flag == "small"


def test_get_parser_falls_back():
    p = get_parser(prefer_spacy=True)
    out = p.parse("a zebra in the middle")
    assert out.dir_flag == "middle"
    assert out.sentence.startswith("a zebra") or out.sentence.startswith("zebra")
