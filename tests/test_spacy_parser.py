"""SpacyParser coverage WITHOUT spaCy: fake-doc fixtures.

spaCy is not installable in this environment, so the parity-critical
adapter (hybridgl_tpu/lang/spacy_parser.py) is driven here through stub
``nlp``/doc/token objects exposing exactly the spaCy surface it touches
(``token.text/.i/.head/.children``, ``doc.noun_chunks`` with
``.start/.end/.text/.root``, ``doc.text``). The fixtures pin the reference
semantics (reference: utils.py:31-133, 207-237): shallowest-head keyword
selection, the root-not-in-chunk fallback through ``children[0]``, the
no-chunk full-sentence fallback, the NULL-keyword relation veto, the
RELATION_WORDS chunk filter, the right-bug, and the whitespace-token scrub
(reference: Hybridgl_main.py:135-142).
"""

import pytest

from hybridgl_tpu.lang.spacy_parser import SpacyParser


class FakeToken:
    def __init__(self, i, text):
        self.i = i
        self.text = text
        self.head = self  # default self-headed (root)
        self.children = []


class FakeChunk:
    def __init__(self, doc, start, end, root_i):
        self.start = start
        self.end = end
        self.text = " ".join(t.text for t in doc.tokens[start:end])
        self.root = doc.tokens[root_i]


class FakeDoc:
    def __init__(self, words, heads, chunks=()):
        """heads[i] = index of token i's head (i itself for the root);
        chunks = ((start, end, root_i), ...)."""
        self.tokens = [FakeToken(i, w) for i, w in enumerate(words)]
        for i, h in enumerate(heads):
            self.tokens[i].head = self.tokens[h]
            if h != i:
                self.tokens[h].children.append(self.tokens[i])
        self.noun_chunks = [FakeChunk(self, s, e, r) for s, e, r in chunks]
        self.text = " ".join(words)

    def __iter__(self):
        return iter(self.tokens)

    def __len__(self):
        return len(self.tokens)


def make_parser(docs, rela_right_bug=True):
    """SpacyParser without spacy: inject a scripted nlp callable."""
    p = object.__new__(SpacyParser)
    p.nlp = lambda text: docs[text]
    p.rela_right_bug = rela_right_bug
    return p


def _register(docs, doc):
    docs[doc.text] = doc
    return doc


def test_basic_noun_phrase_and_left_dir():
    # "the man on the left": root 'man' (i=1) inside chunk (0,2);
    # 'left' (i=4) heads to 'on' (i=2)
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["the", "man", "on", "the", "left"],
            heads=[1, 1, 1, 4, 2],
            chunks=((0, 2, 1), (3, 5, 4)),
        ),
    )
    out = make_parser(docs).parse(d.text)
    assert out.noun_phrase == "the man"
    assert out.head_noun == "man"
    assert out.dir_flag == "left"
    assert out.rela_flag == "left"
    # 'the left' chunk root 'left' is a RELATION_WORD -> filtered from others
    assert out.other_noun_phrases == []
    assert not out.has_other_nouns


def test_shallowest_head_wins():
    # two dir words; the one whose HEAD is earlier in the sentence wins
    # (reference: deep2head tracking, utils.py:108-133)
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["dog", "under", "table", "near", "top"],
            # 'under'(1) heads to dog(0); 'top'(4) heads to near(3)
            heads=[0, 0, 1, 2, 3],
            chunks=((0, 1, 0), (2, 3, 2)),
        ),
    )
    out = make_parser(docs).parse(d.text)
    # 'under' -> down with head.i=0 beats 'top' -> up with head.i=3
    assert out.dir_flag == "down"
    assert out.rela_flag == "down"


def test_head_fallback_through_first_child():
    # root token ('sitting', a verb) not inside any chunk; its first child
    # ('cat') is -> that chunk becomes the noun phrase (utils.py:47-51)
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["cat", "sitting", "on", "mat"],
            heads=[1, 1, 1, 2],
            chunks=((0, 1, 0), (3, 4, 3)),
        ),
    )
    out = make_parser(docs).parse(d.text)
    assert out.noun_phrase == "cat"
    assert out.head_noun == "cat"
    assert out.other_noun_phrases == ["mat"]
    assert out.nouns == ["mat"]
    assert out.has_other_nouns


def test_no_chunk_fallback_returns_sentence():
    # root not in chunks and first child not in chunks either ->
    # (sentence, sentence) (utils.py:50-54)
    docs = {}
    d = _register(
        docs,
        FakeDoc(["running", "fast"], heads=[0, 0], chunks=()),
    )
    out = make_parser(docs).parse(d.text)
    assert out.noun_phrase == d.text
    assert out.head_noun == d.text


def test_rela_right_bug():
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["the", "boy", "on", "the", "right"],
            heads=[1, 1, 1, 4, 2],
            chunks=((0, 2, 1), (3, 5, 4)),
        ),
    )
    buggy = make_parser(docs, rela_right_bug=True).parse(d.text)
    fixed = make_parser(docs, rela_right_bug=False).parse(d.text)
    assert buggy.dir_flag == "right"  # dir path has no bug
    assert buggy.rela_flag == "none"  # utils.py:219 compares str to set
    assert fixed.rela_flag == "right"


def test_null_keyword_vetoes_relation():
    # an other-noun rooted at a NULL keyword ('side') forces rela 'none'
    # even with 'left' present (utils.py:209-211)
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["the", "cow", "on", "the", "left", "side"],
            heads=[1, 1, 1, 5, 5, 2],
            chunks=((0, 2, 1), (3, 6, 5)),
        ),
    )
    out = make_parser(docs).parse(d.text)
    assert out.nouns == ["side"]
    assert out.rela_flag == "none"
    assert out.dir_flag == "left"  # the dir path has no NULL veto


def test_other_nouns_skip_head_and_relation_roots():
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["the", "cup", "near", "the", "plate", "behind", "the", "middle"],
            heads=[1, 1, 1, 4, 2, 4, 7, 5],
            chunks=((0, 2, 1), (3, 5, 4), (6, 8, 7)),
        ),
    )
    out = make_parser(docs).parse(d.text)
    assert out.noun_phrase == "the cup"
    # 'the middle' root 'middle' is in RELATION_WORDS -> dropped
    assert out.other_noun_phrases == ["the plate"]
    assert out.nouns == ["plate"]
    assert out.rela_flag == "up"  # 'behind' is in UP_KEYWORDS
    assert out.dir_flag == "middle"  # 'middle' is a dir word; 'behind' is not


def test_whitespace_scrub_reparses():
    # the driver drops literal ' ' tokens and re-parses the joined text
    docs = {}
    raw = FakeDoc(["the", " ", "dog"], heads=[2, 2, 2], chunks=())
    clean = FakeDoc(["the", "dog"], heads=[1, 1], chunks=((0, 2, 1),))
    docs["the   dog"] = raw  # lower()ed input
    docs["the dog"] = clean
    out = make_parser(docs).parse("THE   DOG")
    assert out.sentence == "the dog"
    assert out.noun_phrase == "the dog"


def test_multiple_roots_last_wins():
    # two self-headed tokens (two sentences): reference keeps the LAST
    # (utils.py:43-45 loop overwrites head)
    docs = {}
    d = _register(
        docs,
        FakeDoc(
            ["dog", "runs", "cat", "sits"],
            heads=[1, 1, 3, 3],  # tokens 1 and 3 are self-headed roots
            chunks=((0, 1, 0), (2, 3, 2)),
        ),
    )
    out = make_parser(docs).parse(d.text)
    # last root is 'sits' (i=3), not in a chunk; children[0] is 'cat' -> chunk
    assert out.noun_phrase == "cat"


def test_big_small_within_flags():
    docs = {}
    for word, flag in [("bigger", "big"), ("smallest", "small"), ("inside", "within")]:
        d = FakeDoc(
            ["the", "one", word],
            heads=[1, 1, 1],
            chunks=((0, 2, 1),),
        )
        docs[d.text] = d
        out = make_parser(docs).parse(d.text)
        assert out.rela_flag == flag, word
