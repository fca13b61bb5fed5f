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


def test_refcoco_style_battery():
    """Battery of RefCOCO-style expressions: the heuristic parser must
    produce sane chunks/flags (spaCy adapter provides exact reference
    parity when installed)."""
    p = HeuristicParser()
    cases = [
        # (sentence, noun_phrase, nouns, dir_flag, rela_flag)
        ("guy in red shirt", "guy", ["shirt"], "none", "none"),
        ("left zebra", "left zebra", [], "left", "left"),
        ("woman on right", "woman", [], "right", "none"),  # right-bug active
        ("man sitting on the couch", "man", ["couch"], "none", "none"),
        ("white car", "white car", [], "none", "none"),
        ("the larger dog", "larger dog", [], "none", "big"),
        ("giraffe to the left of the tree", "giraffe", ["tree"], "left", "left"),
        # two relation keywords ('smaller', 'behind'): the reference picks by
        # dependency depth; the heuristic picks the leftmost occurrence
        ("smaller cup behind the plate", "smaller cup", ["plate"], "none", "small"),
        ("person in front", "person", [], "none", "down"),
        ("the bowl inside the box", "bowl", ["box"], "none", "within"),
    ]
    for sent, np_, nouns, dflag, rflag in cases:
        out = p.parse(sent)
        assert out.noun_phrase == np_, (sent, out.noun_phrase)
        assert out.nouns == nouns, (sent, out.nouns)
        assert out.dir_flag == dflag, (sent, out.dir_flag)
        assert out.rela_flag == rflag, (sent, out.rela_flag)
