"""Synthetic labeled corpus for training the neural emotion classifier.

The reference classifier is a DistilBERT finetuned on GoEmotions
(Scripts/finetuneDistillBert.ipynb); neither the dataset nor any pretrained
weights are reachable in a zero-egress environment, so the in-repo neural
checkpoint is trained on this generator instead: per-label templates and
keyword banks compose sentences whose ground-truth label is fixed by
construction (the template/keyword bank they came from — NOT lexicon
predictions, so a trained model can beat the lexicon on held-out surface
forms). Templates and keywords are split train/eval so evaluation measures
generalization to unseen combinations, plus a small hand-written
out-of-distribution eval set.
"""

from __future__ import annotations

import random

from .config import ID2LABEL
from .lexicon import _LEXICON

# extra surface forms beyond the lexicon keys, per label — gives the neural
# model coverage the bag-of-words lexicon doesn't have
_EXTRA: dict[str, list[str]] = {
    "admiration": ["in awe of", "look up to", "outstanding", "remarkable",
                   "masterful", "what a performance", "stunning",
                   "magnificent", "extraordinary", "superb", "admirable",
                   "hats off", "genius", "phenomenal", "world class"],
    "amusement": ["cracked me up", "giggling", "so silly", "in stitches",
                  "chuckled", "comical", "witty", "goofy", "ridiculous in "
                  "the best way", "burst out laughing", "entertaining",
                  "playful", "snickered", "what a clown"],
    "anger": ["fuming", "seeing red", "boiling", "fed up", "enraged",
              "makes my blood boil", "irate", "hostile", "resent",
              "screaming at", "slammed the door", "want to punch",
              "sick of this", "had it with"],
    "annoyance": ["getting on my nerves", "pet peeve", "tiresome",
                  "grating", "pestering", "aggravating", "exasperating",
                  "eye roll", "so tedious", "keeps interrupting",
                  "why do they always", "drives me crazy", "nagging"],
    "approval": ["sounds good", "well said", "i'm on board", "makes sense",
                 "fair point", "couldn't agree more", "exactly right",
                 "spot on", "i second that", "well deserved", "thumbs up",
                 "that works for me", "valid", "reasonable"],
    "caring": ["take care of", "thinking of you", "wrapped in a blanket",
               "nurture", "watch over", "hold you close", "checked in on",
               "made soup for", "protective of", "compassion", "kindness",
               "be gentle with yourself", "i've got you", "lean on me"],
    "confusion": ["makes no sense", "can't wrap my head", "bewildered",
                  "mixed up", "what is going on", "scratching my head",
                  "perplexed", "disoriented", "which is it", "contradicts",
                  "can't follow", "muddled", "what does that even mean"],
    "curiosity": ["tell me more", "dying to know", "fascinating",
                  "what's inside", "i keep wondering", "inquisitive",
                  "intriguing", "how it works", "want to explore",
                  "what happens if", "down the rabbit hole", "mystery",
                  "can't stop googling", "i must know", "need to know "
                  "more", "i wonder what", "burning question"],
    "desire": ["i'd give anything", "dream of", "aching for", "if only i",
               "can't stop thinking about having", "covet", "tempted",
               "craving", "itching to", "would kill for", "on my wishlist",
               "i need it so badly", "someday i'll own"],
    "disappointment": ["not what i hoped", "fell short", "deflated",
                       "such a letdown", "expected better", "bummed out",
                       "anticlimactic", "didn't live up", "what a waste",
                       "so much for that", "crushed my hopes", "letdown",
                       "what a letdown", "it flopped", "mediocre at best"],
    "disapproval": ["not okay", "i object", "out of line", "frown upon",
                    "that crosses a line", "poor form", "inappropriate",
                    "can't condone", "bad practice", "shame on",
                    "i'm against this", "vote no", "unethical"],
    "disgust": ["makes me gag", "turned my stomach", "foul", "repugnant",
                "yuck", "can't stand the smell", "rancid", "slimy",
                "putrid", "grosses me out", "filthy", "nauseating",
                "ew", "vomit"],
    "embarrassment": ["want to disappear", "red in the face", "mortified",
                      "so awkward of me", "face palm", "cringed so hard",
                      "tripped in front of everyone", "wrong name",
                      "caught on camera", "humiliating", "blushed",
                      "wish the floor would swallow me"],
    "excitement": ["over the moon", "buzzing", "counting down the days",
                   "jumping up and down", "electric", "fired up",
                   "adrenaline", "can hardly sleep", "so pumped",
                   "let's gooo", "ecstatic", "thrill", "exhilarating"],
    "fear": ["shaking", "heart pounding", "creeped out", "haunted",
             "petrified", "too scared to move", "terror", "chills down my "
             "spine", "nightmare", "lurking in the dark", "paralyzed",
             "skin crawl", "dreading", "phobia", "alarmed"],
    "gratitude": ["means the world", "much obliged", "owe you one",
                  "deeply thankful", "can't thank you enough", "blessed",
                  "so generous of you", "lifesaver", "couldn't have done "
                  "it without you", "touched by your help", "indebted",
                  "what a gift", "thank you so much", "thanks so much",
                  "thank you very much", "thank you for everything",
                  "thanks a million", "many thanks", "i appreciate it",
                  "i really appreciate", "so kind of you"],
    "grief": ["heart aches for", "gone too soon", "in mourning",
              "an empty chair", "we lost her", "rest in peace", "buried",
              "the funeral was", "passed last night", "widow", "memorial",
              "miss him every day", "condolences", "heartache"],
    "joy": ["walking on sunshine", "beaming", "over the rainbow",
            "what a beautiful morning", "bursting with happiness",
            "grinning ear to ear", "smile", "smiling", "laughter filled",
            "best day ever", "pure bliss", "radiant", "heart full",
            "dancing around the kitchen", "delight", "delightful"],
    "love": ["head over heels", "my darling", "soulmate", "smitten",
             "you complete me", "butterflies in my stomach", "devoted",
             "affection", "my better half", "anniversary", "valentine",
             "can't imagine life without", "warm embrace", "my dearest"],
    "nervousness": ["butterflies before", "sweaty palms", "on pins and "
                    "needles", "trembling before the interview", "jumpy",
                    "can't sit still before", "stage fright", "fidgeting",
                    "overthinking it", "stomach in knots", "restless",
                    "biting my nails", "apprehensive"],
    "optimism": ["brighter tomorrow", "it will work out", "silver lining",
                 "good things ahead", "the sun will rise", "hope springs",
                 "glass half full", "we'll bounce back", "promising",
                 "upbeat", "better days are coming", "rooting for",
                 "fresh start"],
    "pride": ["stand tall", "earned every bit", "my finest hour",
              "did it myself", "badge of honor", "beaming with pride",
              "personal best", "graduated with honors", "self made",
              "look how far we've come", "milestone", "crowning "
              "achievement", "nailed it"],
    "realization": ["it hit me", "the penny dropped", "aha moment",
                    "now it clicks", "i finally see", "all makes sense "
                    "now", "in hindsight", "connecting the dots",
                    "epiphany", "just understood why", "it dawned",
                    "the missing piece", "so that's why", "i finally "
                    "understand", "now i understand", "just realized",
                    "it turns out"],
    "relief": ["load off my mind", "breathe again", "crisis averted",
               "glad that's over", "exhaled at last", "off the hook",
               "false alarm", "made it just in time", "the tests came "
               "back clear", "weight lifted", "thank goodness",
               "no harm done", "unclenched"],
    "remorse": ["i take it back", "shouldn't have said", "haunts me that i",
                "forgive me", "i owe an apology", "weighs on my "
                "conscience", "if i could undo", "i was wrong to",
                "feel terrible about", "never should have", "i hurt them",
                "making amends", "penitent", "feel awful about",
                "it was wrong of me", "wish i hadn't"],
    "sadness": ["down in the dumps", "blue today", "empty inside",
                "weeping", "gloomy", "heavy heart", "sobbed", "tearful",
                "melancholy", "downcast", "aching loneliness", "somber",
                "nothing feels right", "hollow"],
    "surprise": ["didn't see that coming", "jaw dropped", "blindsided",
                 "out of the blue", "plot twist", "caught me off guard",
                 "whoa", "no way", "startled", "gasped", "speechless",
                 "never expected", "bolt from nowhere", "stunned me"],
    "neutral": ["the meeting is at noon", "it is tuesday", "the report has "
                "ten pages", "the train leaves from platform two",
                "the wall is painted gray", "water boils at a hundred "
                "degrees", "the store opens at nine", "my desk has two "
                "drawers", "the file was saved", "the road goes north",
                "the invoice is attached", "the agenda for friday is "
                "pinned to the corkboard", "the package weighs two kilograms",
                "the printer is on the second floor", "the recipe calls "
                "for two eggs", "the bus runs every fifteen minutes",
                "the form has three sections", "the update installs "
                "tonight", "the lecture covers chapter four",
                "the parking lot is behind the building"],
}

# Third wave of bank coverage (round 2, after the 56-sentence OOD error
# analysis): two general FAMILIES real text uses that templates x
# adjectives never produce — (a) physiological-symptom phrases (the body
# state names the emotion: racing heart, burning cheeks), (b) protective
# imperatives for "caring" (the emotion is an instruction to someone
# else, not a feeling word). Plus ordinary vocabulary depth. These are
# generic English idioms, deliberately NOT sentences from OOD_EVAL.
_EXTRA2: dict[str, list[str]] = {
    "admiration": ["impressive", "inspiring", "what a talent",
                   "true craftsmanship", "second to none", "top notch",
                   "the skill on display", "i could never do that",
                   "pure class", "a master at work"],
    "amusement": ["couldn't stop laughing", "laughed until i cried",
                  "howling with laughter", "tears of laughter",
                  "hilarious", "hysterical", "comedy gold",
                  "had me rolling", "belly laugh", "laughing so hard",
                  "funniest thing i've seen", "a riot"],
    "anger": ["livid", "clenched my fists", "through the roof",
              "grinding my teeth", "about to explode", "blood boiling",
              "lost my temper", "shaking with rage", "how dare they",
              "crossed the line for the last time"],
    "annoyance": ["for the hundredth time", "enough already",
                  "every single time", "testing my patience",
                  "won't stop", "again and again", "over and over",
                  "so irritating", "can't hear myself think"],
    "approval": ["good idea", "i agree with this", "i support this",
                 "sensible", "the right call", "no objections",
                 "sound plan", "i'm for it", "makes perfect sense",
                 "a fair arrangement", "seems reasonable to me"],
    "caring": ["drive safely", "get home safe", "call me when you "
               "arrive", "bundle up out there", "get some rest",
               "don't forget your jacket", "let me know you're okay",
               "i'll keep you company", "eat something today",
               "wear something warm", "take your medicine",
               "i'll wait up for you", "be careful on the ice"],
    "confusion": ["lost the thread", "can't make heads or tails",
                  "baffled", "none of this adds up", "i'm lost",
                  "which one is right", "totally turned around",
                  "the numbers don't match", "wait what"],
    "curiosity": ["what could it be", "peeked inside", "so many "
                  "questions", "wonder how they did it", "had to take "
                  "a closer look", "what's the story behind"],
    "desire": ["wish i had", "longing for", "yearning", "daydreaming "
               "about", "if only it were mine", "i want it so much",
               "been saving up for", "first thing i'd buy"],
    "disappointment": ["hopes dashed", "not worth the wait",
                       "underwhelming", "all that buildup for nothing",
                       "thought it would be better", "left wanting",
                       "overhyped", "doesn't deliver"],
    "disapproval": ["should be ashamed", "not acceptable",
                    "i can't support", "sets a bad precedent",
                    "this is wrong and everyone knows it",
                    "they shouldn't get away with it", "beneath them"],
    "disgust": ["stomach turned", "lost my appetite", "nearly threw "
                "up", "recoiled", "revolting", "repulsive", "had to "
                "look away", "washed my hands twice", "gag reflex"],
    "embarrassment": ["cheeks burning", "face went red", "cringe",
                      "so embarrassing", "wanted to hide", "everyone "
                      "was staring at me", "dying inside", "in front "
                      "of the whole class", "wished i could vanish"],
    "excitement": ["can't wait", "counting the minutes", "thrilled to "
                   "bits", "bursting to tell someone", "big day "
                   "tomorrow", "it's finally happening"],
    "fear": ["frozen with fear", "heart in my throat", "afraid to "
             "look", "white knuckles", "dared not move", "every "
             "shadow made me jump", "cold sweat"],
    "gratitude": ["so thankful", "forever grateful", "you saved my "
                  "day", "couldn't be more grateful", "i owe you",
                  "beyond kind of you", "you didn't have to do that"],
    "grief": ["never got to say goodbye", "visiting the grave",
              "keeps his photo close", "a year since we lost",
              "the eulogy", "her side of the bed is empty",
              "grieving", "taken from us too young"],
    "joy": ["couldn't stop smiling", "happiest i've been", "singing "
            "in the shower", "skipped all the way home", "lit up the "
            "whole room", "what a wonderful day"],
    "love": ["my whole heart", "love of my life", "sweetheart",
             "falling for", "my person", "never felt this way",
             "meant to be", "every moment with you"],
    "nervousness": ["heart is racing", "palms are sweating", "hands "
                    "are shaking", "pacing back and forth", "knees "
                    "went weak", "a nervous wreck", "dread building",
                    "can't eat before", "mind keeps racing",
                    "waiting by the phone", "what if i mess up"],
    "optimism": ["we'll get through this", "turn the corner",
                 "onwards and upwards", "the tide will turn",
                 "tomorrow is a new day", "things are looking up",
                 "our luck is changing", "next time we'll win"],
    "pride": ["so proud of", "worked for every bit of it", "did it on "
              "my own", "held my head high", "my proudest moment",
              "all that practice paid off", "from nothing to this"],
    "realization": ["suddenly it was obvious", "everything fell into "
                    "place", "now i get it", "it occurred to me",
                    "i see it now", "the pieces fit", "should have "
                    "seen it sooner", "that explains everything"],
    "relief": ["dodged a bullet", "finally over", "a huge weight off",
               "all clear", "the panic was for nothing", "everyone is "
               "safe", "it still works", "nothing was broken"],
    "remorse": ["can't forgive myself", "it was my fault", "i let "
                "them down", "if i could take it back", "no excuse "
                "for what i did", "kept me up at night"],
    "sadness": ["fighting back tears", "cried myself to sleep",
                "everything feels gray", "missing what we had",
                "a lump in my throat", "can't stop crying",
                "the joy has gone out of it"],
    "surprise": ["did a double take", "couldn't believe my eyes",
                 "froze in place", "astonished", "dumbfounded",
                 "flabbergasted", "who would have thought", "of all "
                 "people", "that came out of nowhere"],
    "neutral": ["the thermostat is set to twenty degrees",
                "the ferry crosses twice a day",
                "the manual is in the glove box",
                "the warranty expires in march",
                "the elevator stops on even floors",
                "the spreadsheet has twelve columns"],
}

# {kw} templates; neutral uses the phrases directly (they are sentences)
_TEMPLATES = [
    "i am {kw} right now",
    "feeling {kw} today",
    "that movie left me {kw}",
    "honestly, {kw} is the only word for it",
    "this whole situation is {kw}",
    "i can't help feeling {kw} about tomorrow",
    "after the call i was {kw}",
    "she said she was {kw} all week",
    "everything about this makes me {kw}",
    "my friend thinks i'm {kw} but it's worse",
    "{kw}, that's how the news made me feel",
    "to be fair i felt pretty {kw} at dinner",
    "the ending of the book was {kw}",
    "it's been a {kw} kind of morning",
    "deep down i am still {kw} about it",
    "you could tell the whole room felt {kw}",
    "i woke up {kw} and it never went away",
    "the message from my boss made me {kw}",
    "no matter what i do i end up {kw}",
    "why does every monday leave me {kw}",
    "{kw}",
    "so {kw}",
    "just {kw} honestly",
    "kind of {kw} about the whole thing",
    "the weather made everyone {kw}",
    "reading that letter i felt {kw}",
    "we were all {kw} when the results came in",
    "my sister sounded {kw} on the phone",
    "the concert crowd was {kw} from start to finish",
    "lately i've been {kw} more than usual",
    "he looked {kw} standing by the window",
    "the first day of school always makes kids {kw}",
    "watching the game we got {kw}",
    "that conversation left us both {kw}",
    "the photo made my parents {kw}",
    "i arrived {kw} and left even more so",
    "the meeting ended with everyone {kw}",
    "somehow the song makes me {kw} every time",
    "walking home in the rain i felt {kw}",
    # long, noun-heavy frames: real text buries the cue among content
    # words — the model must stay {kw}-driven through whole clauses
    "the package on the kitchen table this morning made me {kw}",
    "after the delivery driver left i stood in the hallway feeling {kw}",
    "halfway through fixing the printer i noticed i was {kw}",
    "between the airport and the hotel everyone on the bus got {kw}",
    "the voicemail from the landlord about the lease left us {kw}",
    "sorting through boxes in the garage all weekend made her {kw}",
    "the email about the schedule change had the whole office {kw}",
    "the verdict left the town {kw}",
    "during the speech the audience grew {kw}",
    "her reply made me instantly {kw}",
    "being here again makes me {kw}",
    "thinking about next year i get {kw}",
    "by the end of the trip we were {kw}",
    "the puppy at the shelter made us {kw}",
    "that headline this morning left me {kw}",
    "the quiet house makes me {kw} at night",
    "opening the envelope i suddenly felt {kw}",
    "every time it rains i turn {kw}",
]
_PHRASE_TEMPLATES = [
    "{kw}",
    "i {kw}",
    "it {kw} when i think about it",
    "talking to her, i just {kw}",
    "{kw} — that sums up my day",
    "after everything, {kw}",
    # long noun-heavy frames for MULTI-WORD cues: real text buries a
    # phrase like "thank you so much" among content words; without these
    # the phrase bank only ever trained in short frames
    "{kw} for helping with the suitcase and the tickets",
    "after the meeting at the office, honestly {kw}",
    "i told my neighbor {kw} before the bus left the station",
    "{kw}, and the whole afternoon at the market went by",
    "standing in the hallway with the boxes i thought, {kw}",
    "the voicemail said it all: {kw}",
    "even with the rain and the late train, {kw}",
    "reading the letter from the landlord i muttered {kw}",
]

# Hand-written free-text eval: two sentences per label, none generated
# from the templates or banks. Deliberately long and noun-heavy — real
# user text buries the emotional cue among content words the model never
# trained on.
OOD_EVAL = [
    ("my grandmother's recipes always make everyone smile with delight",
     "joy"),
    ("the whole team was grinning ear to ear when the rocket landed",
     "joy"),
    ("the spider crawling up my arm made my skin crawl with terror",
     "fear"),
    ("walking through the abandoned hospital at midnight left me petrified",
     "fear"),
    ("they canceled the concert i waited months for, what a letdown",
     "disappointment"),
    ("the restaurant everyone raved about turned out mediocre at best",
     "disappointment"),
    ("thank you so much for helping me move all those boxes", "gratitude"),
    ("i really appreciate you covering my shift on such short notice",
     "gratitude"),
    ("i shouted at my sister and i feel awful about it now", "remorse"),
    ("i never should have forwarded that email, it was wrong of me",
     "remorse"),
    ("we buried my uncle last sunday and the house feels empty", "grief"),
    ("her chair at the kitchen table has been empty since the funeral",
     "grief"),
    ("did you hear they found water on that distant planet? i must know "
     "more", "curiosity"),
    ("what's behind the locked door in the basement? i keep wondering "
     "about it", "curiosity"),
    ("the schedule for next week is posted on the board", "neutral"),
    ("the conference room projector takes a minute to warm up", "neutral"),
    ("i finally understand why the experiment kept failing", "realization"),
    ("it just hit me that the two witnesses told the same story",
     "realization"),
    ("stop touching my desk, it drives me up the wall", "annoyance"),
    ("the neighbor's car alarm has gone off every night this week and it "
     "is so grating", "annoyance"),
    ("the way she rebuilt that vintage engine by hand is remarkable",
     "admiration"),
    ("his performance in the final act was absolutely masterful",
     "admiration"),
    ("the cat chasing the laser pointer had us in stitches", "amusement"),
    ("my nephew's knock knock jokes cracked me up all afternoon",
     "amusement"),
    ("the contractor took our deposit and never showed, i am fuming",
     "anger"),
    ("he read my diary and told everyone, i am seeing red", "anger"),
    ("extending the deadline makes sense given the circumstances",
     "approval"),
    ("splitting the project into two phases sounds good to me", "approval"),
    ("i made you a thermos of soup for the drive, stay warm", "caring"),
    ("text me when you land so i know you got there safe", "caring"),
    ("the assembly instructions contradict the diagram, i can't follow "
     "either", "confusion"),
    ("wait, the meeting moved to thursday or the deadline did? which is "
     "it", "confusion"),
    ("i'd give anything for a house with a view of the harbor", "desire"),
    ("i keep picturing myself behind the wheel of that convertible",
     "desire"),
    ("dumping chemicals in the river is not okay and the town should "
     "say so", "disapproval"),
    ("charging students for the library printer is poor form",
     "disapproval"),
    ("the fridge leftovers had grown fur and the smell made me gag",
     "disgust"),
    ("there was a hair baked into the pizza, i nearly vomited", "disgust"),
    ("i called the ceo by the wrong name in front of the whole company",
     "embarrassment"),
    ("my mic was on during the entire meeting while i sang, mortifying",
     "embarrassment"),
    ("the tour dates dropped this morning and i am so pumped", "excitement"),
    ("counting down the days until the championship game, i can hardly "
     "sleep", "excitement"),
    ("the sonogram photo on the fridge makes my heart full every morning",
     "love"),
    ("after twenty years she still leaves notes in my lunch, my dearest",
     "love"),
    ("my hands won't stop fidgeting before the licensing exam",
     "nervousness"),
    ("the recruiter said they'd call by five and my stomach is in knots",
     "nervousness"),
    ("the harvest failed this year but better days are coming", "optimism"),
    ("new coach, new season, i really think we'll bounce back", "optimism"),
    ("i rebuilt the transmission myself and it runs like new, personal "
     "best", "pride"),
    ("first in my family to graduate, i stood tall on that stage", "pride"),
    ("the biopsy came back benign and i can breathe again", "relief"),
    ("found my passport in the jacket pocket right before boarding, "
     "thank goodness", "relief"),
    ("the scholarship i gave up on just landed in my inbox, i never "
     "expected it", "surprise"),
    ("my quiet coworker turned out to be a former circus acrobat, jaw "
     "dropped", "surprise"),
    ("the playground where we grew up is gone and i feel hollow",
     "sadness"),
    ("rain on the window, cold coffee, and nothing feels right today",
     "sadness"),
]


def _variants(kw: str) -> list[str]:
    """Cheap morphological variants for single alphabetic words."""
    out = [kw]
    if " " not in kw and kw.isalpha() and len(kw) > 3:
        if kw.endswith("e"):
            out += [kw + "d", kw[:-1] + "ing"]
        elif not kw.endswith("ing"):
            out += [kw + "ed", kw + "ing"]
        out.append(kw + "s")
    return out


def label_banks() -> dict[str, list[str]]:
    """label -> list of keyword/phrase surface forms. Forms that appear in
    more than one label's bank are dropped everywhere (they are label noise
    for training and unresolvable ambiguity at eval)."""
    banks = {}
    for label in ID2LABEL.values():
        forms = []
        for kw in _LEXICON.get(label, []):
            forms.extend(_variants(kw))
        forms.extend(_EXTRA.get(label, []))
        forms.extend(_EXTRA2.get(label, []))
        banks[label] = sorted(set(forms))
    from collections import Counter

    counts = Counter(f for forms in banks.values() for f in set(forms))
    dupes = {f for f, c in counts.items() if c > 1}
    return {label: [f for f in forms if f not in dupes]
            for label, forms in banks.items()}


def _word_dropout(text: str, rng: random.Random, p: float = 0.12,
                  keep: str = "") -> str:
    """Drop random CONTEXT words (regularizer: the model can't rely on any
    single template word). Words of the keyword span ``keep`` are never
    dropped — dropping the label-bearing span would be label noise."""
    words = text.split()
    if len(words) < 4:
        return text
    protected = set(keep.split())
    kept = [w for w in words
            if w.strip(".,!?—") in protected or rng.random() > p]
    return " ".join(kept) if len(kept) >= 2 else text


# Everyday label-neutral content words for substitution augmentation.
# The round-2 model only substituted TEMPLATE words, so genuinely unseen
# nouns at eval time (boxes, experiment, planet) had untrained embeddings
# that drowned the cue phrase — the top OOD failure mode. Substituting
# these (plus seeded gibberish, which exercises unseen subword
# decompositions) teaches the model that arbitrary content words carry no
# label. Words that also occur inside any bank form are filtered out at
# pool-build time so the pool stays label-uniform by construction.
_GENERIC_WORDS = [
    "kitchen", "garage", "window", "bicycle", "printer", "garden",
    "station", "ticket", "jacket", "bridge", "coffee", "engine",
    "library", "pocket", "basket", "ladder", "market", "bottle",
    "pillow", "carpet", "mirror", "drawer", "hallway", "ceiling",
    "battery", "camera", "laptop", "folder", "pencil", "napkin",
    "suitcase", "umbrella", "calendar", "envelope", "keyboard",
    "sandwich", "blanket", "curtain", "shelf", "stairs", "tunnel",
    "harbor", "village", "airport", "museum", "factory", "office",
    "garage", "rooftop", "balcony", "corridor", "cupboard", "toolbox",
    "weekend", "tuesday", "morning", "evening", "carried", "painted",
    "folded", "stacked", "mailed", "parked", "printed", "measured",
    "plumber", "teacher", "driver", "cousin", "neighbor", "landlord",
    "receipt", "voucher", "catalog", "manual", "chapter", "paragraph",
    # polysemous everyday words: these show up inside real emotional text
    # as plain content ("stay warm", "the deadline", "cool water") — if
    # they only ever co-occur with one label the model treats them as
    # cues; keeping them label-uniform in the pool prevents that
    "warm", "cool", "deadline", "meeting", "schedule", "project",
    "minute", "second", "double", "single", "drive", "land", "water",
    "light", "heavy", "sharp", "plain", "level", "check", "charge",
    "board", "table", "glass", "paper", "stone", "metal", "plastic",
    "thursday", "monday", "friday", "summer", "winter", "spring",
    "button", "switch", "signal", "cable", "screen", "speaker",
    "wallet", "pocket", "jacket", "collar", "sleeve", "button",
    "sister", "brother", "uncle", "aunt", "grandfather", "colleague",
    "manager", "student", "doctor", "lawyer", "farmer", "painter",
    "baker", "tailor", "editor", "author", "singer", "dancer",
    "river", "valley", "meadow", "forest", "desert", "island",
    "street", "avenue", "corner", "block", "district", "suburb",
    "breakfast", "dinner", "supper", "snack", "dessert", "salad",
    "noodle", "pepper", "butter", "honey", "sugar", "flour",
    "hammer", "wrench", "shovel", "bucket", "sponge", "broom",
    "copied", "sorted", "labeled", "wrapped", "loaded", "shipped",
    "trimmed", "watered", "swept", "vacuumed", "ironed", "dusted",
    "tuesday", "january", "august", "october", "afternoon", "midday",
    "bicycle", "scooter", "trailer", "tractor", "ferry", "subway",
    "magnet", "compass", "lantern", "candle", "thermos", "kettle",
    "carton", "crate", "barrel", "pallet", "bundle", "parcel",
    "notice", "memo", "invoice", "ledger", "roster", "agenda",
    "lobby", "attic", "basement", "porch", "driveway", "fence",
    "sweater", "scarf", "mitten", "boot", "sandal", "helmet",
]


def _gibberish(rng: random.Random) -> str:
    letters = "abcdefghijklmnopqrstuvwxyz"
    return "".join(rng.choice(letters)
                   for _ in range(rng.randint(4, 9)))


def _context_pool() -> list[str]:
    """Every context word the templates can produce, plus the generic
    content-word list (all label-uniform by construction — templates pair
    with all labels equally, and generic words that occur inside any bank
    form are excluded)."""
    bank_words = {w for forms in label_banks().values()
                  for f in forms for w in f.split()}
    pool = set(_GENERIC_WORDS) - bank_words
    for t in _TEMPLATES + _PHRASE_TEMPLATES:
        pool.update(t.replace("{kw}", " ").replace(",", " ")
                    .replace("—", " ").split())
    return sorted(pool)


def _word_substitute(text: str, rng: random.Random, pool: list[str],
                     p: float = 0.15, keep: str = "",
                     p_junk: float = 0.25) -> str:
    """Replace random CONTEXT words with random label-neutral words —
    template language, generic content words, or (with ``p_junk``)
    seeded gibberish whose subword decomposition the model has never
    seen. The label is still fixed by the protected keyword span, so this
    teaches the model that context tokens are unreliable — the defense
    against unseen words (untrained embeddings) hijacking the prediction
    at eval time."""
    protected = set(keep.split())

    def repl():
        return (_gibberish(rng) if rng.random() < p_junk
                else rng.choice(pool))

    out = [w if w.strip(".,!?—") in protected or rng.random() > p
           else repl()
           for w in text.split()]
    return " ".join(out)


def make_corpus(n_per_label: int = 220, seed: int = 0,
                eval_frac: float = 0.2) -> dict:
    """-> {"train", "eval", "eval_unseen_forms", "ood"}: (texts, labels)
    with label ids in config ID2LABEL order.

    - ``eval``: held-out TEMPLATES composed with trained keyword forms —
      every (template, keyword) pair is unseen; measures compositional
      generalization (the primary metric).
    - ``eval_unseen_forms``: held-out keyword surface forms — lexical items
      the model never trained on. A from-scratch model (no pretraining)
      can only reach these through subword sharing; reported honestly as a
      secondary metric.
    """
    rng = random.Random(seed)
    banks = label_banks()
    pool = _context_pool()
    label2id = {v: k for k, v in ID2LABEL.items()}

    templates = _TEMPLATES[:]
    rng.shuffle(templates)
    n_eval_t = max(3, int(len(templates) * eval_frac))
    eval_templates, train_templates = (templates[:n_eval_t],
                                       templates[n_eval_t:])
    phrase_templates = _PHRASE_TEMPLATES[:]
    rng.shuffle(phrase_templates)
    eval_ptemplates, train_ptemplates = (phrase_templates[:2],
                                         phrase_templates[2:])

    train_x, train_y = [], []
    eval_x, eval_y = [], []
    uf_x, uf_y = [], []
    for label, forms in banks.items():
        forms = forms[:]
        rng.shuffle(forms)
        n_uf = max(1, int(len(forms) * 0.1))
        unseen_forms, train_forms = forms[:n_uf], forms[n_uf:]
        lid = label2id[label]

        def emit(n, temps, ptemps, bank, xs, ys, augment=False):
            for _ in range(n):
                kw = rng.choice(bank)
                if label == "neutral":
                    text = kw  # neutral bank entries are full sentences
                    if rng.random() < 0.3:
                        text = text + " and " + rng.choice(bank)
                elif " " in kw:
                    text = rng.choice(ptemps).format(kw=kw)
                else:
                    text = rng.choice(temps).format(kw=kw)
                # two-clause composition: real text is usually
                # "content clause, cue clause" ("the contractor took our
                # deposit and never showed, i am fuming") — a cue-free
                # clause (same generator as the cue-free neutral
                # sentences) is glued on either side. The label stays the
                # cue clause's: the model must find the cue ANYWHERE and
                # let it override a whole neutral-looking clause, the top
                # remaining OOD failure mode after round 2's context
                # substitution.
                if augment and label != "neutral" and rng.random() < 0.35:
                    filler = (_gibberish(rng) if rng.random() < 0.2
                              else rng.choice(pool))
                    clause = rng.choice(temps).format(kw=filler)
                    text = (clause + ", " + text if rng.random() < 0.5
                            else text + ", " + clause)
                if augment and rng.random() < 0.5:
                    text = _word_dropout(text, rng, keep=kw)
                if augment and rng.random() < 0.5:
                    text = _word_substitute(text, rng, pool, keep=kw)
                xs.append(text)
                ys.append(lid)

        emit(n_per_label, train_templates, train_ptemplates, train_forms,
             train_x, train_y, augment=True)
        emit(max(8, n_per_label // 8), eval_templates, eval_ptemplates,
             train_forms, eval_x, eval_y)
        emit(max(8, n_per_label // 16), eval_templates, eval_ptemplates,
             unseen_forms, uf_x, uf_y)

    # Cue-free sentences are GoEmotions "neutral" by definition: a
    # template whose {kw} slot holds a generic content word (or gibberish
    # with no trained-cue subword overlap) carries no emotional signal.
    # Without these the model has no "no cue present" basin — text whose
    # words it never trained on falls through untrained embeddings to an
    # arbitrary high-confidence label (the observed desire/love
    # black-holes on free text).
    nid = label2id["neutral"]
    for _ in range(n_per_label // 2):
        filler = (_gibberish(rng) if rng.random() < 0.3
                  else rng.choice(pool))
        text = rng.choice(train_templates).format(kw=filler)
        # two-clause cue-free sentences: keep "comma + two clauses" itself
        # label-neutral (the emotional train split composes clauses too)
        if rng.random() < 0.35:
            filler2 = (_gibberish(rng) if rng.random() < 0.2
                       else rng.choice(pool))
            text = text + ", " + rng.choice(train_templates).format(
                kw=filler2)
        if rng.random() < 0.5:
            text = _word_substitute(text, rng, pool)
        train_x.append(text)
        train_y.append(nid)

    # bare-keyword templates ("{kw}") and neutral full-sentence banks can
    # reproduce a train text verbatim in eval; drop those pairs so the eval
    # splits measure strictly unseen text
    seen = set(train_x)
    eval_x, eval_y = zip(*[(x, y) for x, y in zip(eval_x, eval_y)
                           if x not in seen]) if eval_x else ([], [])
    uf_x, uf_y = zip(*[(x, y) for x, y in zip(uf_x, uf_y)
                       if x not in seen]) if uf_x else ([], [])
    ood_x = [t for t, _ in OOD_EVAL]
    ood_y = [label2id[l] for _, l in OOD_EVAL]
    return {"train": (train_x, train_y),
            "eval": (list(eval_x), list(eval_y)),
            "eval_unseen_forms": (list(uf_x), list(uf_y)),
            "ood": (ood_x, ood_y)}


def tokenizer_corpus(train_texts: list[str]) -> list[str]:
    """Texts the WordPiece vocab is built from: the train split plus the
    raw template strings (context words only — '{kw}' stripped). A
    tokenizer's vocabulary is deployment-scoped, not label-supervised —
    covering the template language keeps held-out-template eval sentences
    from decomposing into character soup (a pure tokenization confound);
    held-out keyword FORMS stay out of the vocab, so the unseen-forms
    split still measures subword generalization."""
    ctx = [t.replace("{kw}", " ") for t in _TEMPLATES + _PHRASE_TEMPLATES]
    return list(train_texts) + ctx


def build_wordpiece_vocab(texts: list[str],
                          min_freq: int = 1) -> list[str]:
    """Word-level vocab with character fallback: specials, every word seen
    >= min_freq times, common English suffixes as '##' continuations, plus
    ALL ascii letters/digits (not just seen ones) and their '##' forms so
    any unseen word decomposes instead of hitting [UNK]."""
    import string
    from collections import Counter

    from ..models.distilbert import WordPieceTokenizer

    words = Counter()
    chars = set(string.ascii_lowercase) | set(string.digits)
    for t in texts:
        for w in WordPieceTokenizer._basic(t):
            words[w] += 1
            chars.update(w)
    # suffix pieces let morphological variants of a trained stem share its
    # embedding path ("happier" -> happi + ##er when "happi*" stems exist)
    suffixes = ["s", "es", "ed", "d", "ing", "er", "ier", "est", "iest",
                "ly", "ily", "ness", "ful", "less", "y", "e", "n", "r"]
    # stem pieces: every prefix (len >= 4) of a seen word. Trained via
    # random-split piece dropout (train_scratch encodes a word as
    # stem + ##pieces with small probability), they give unseen
    # morphological forms a trained-embedding path at eval time.
    stems = {w[:s] for w in words if len(w) >= 5 and w.isalpha()
             for s in range(4, len(w))}
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += sorted(w for w, c in words.items() if c >= min_freq)
    vocab += sorted(stems - set(vocab))
    vocab += sorted(chars - set(vocab))
    vocab += sorted({"##" + c for c in chars} | {"##" + s for s in suffixes})
    return vocab
