"""Calibration datasets.

The reference streams 96 MSCOCO-2017 captions for diffusion calibration
(get_calib_dataset_dm, calib_data.py:174-213) and pileval text blocks
for LLMs (get_calib_dataset, calib_data.py:11-69).  This environment has
no network egress, so:

* diffusion prompts: try `datasets` locally, else a baked-in COCO-style
  caption set (captions follow the same short-scene-description
  distribution; cutoff 200 chars like calib_data.py:183,200);
* LLM text: local `datasets` cache or user-supplied list.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

_BUILTIN_PROMPTS: List[str] = [
    "A man riding a wave on top of a surfboard.",
    "A kitchen with a stove, sink and refrigerator.",
    "Two dogs playing with a frisbee in a grassy park.",
    "A group of people standing around a food truck.",
    "A red double decker bus driving down a city street.",
    "A plate of pasta with tomato sauce and basil on a wooden table.",
    "A young girl holding an umbrella in the rain.",
    "A herd of elephants walking across a dry grass field.",
    "A laptop computer sitting on top of a wooden desk.",
    "A baseball player swinging a bat at a ball.",
    "A bathroom with a white toilet and a glass shower.",
    "Several boats docked at a marina at sunset.",
    "A cat sleeping on a windowsill next to a potted plant.",
    "A man in a suit riding a bicycle down the road.",
    "A pizza topped with cheese, pepperoni and mushrooms.",
    "A stop sign on the corner of a quiet street.",
    "A woman sitting on a bench reading a book in a park.",
    "A train traveling over a bridge across a river.",
    "Two giraffes standing next to each other near trees.",
    "A bowl of fresh fruit including apples, bananas and oranges.",
    "A skier going down a steep snow covered mountain.",
    "A motorcycle parked on the side of a dirt road.",
    "A clock tower rising above the old town square.",
    "A child blowing out candles on a birthday cake.",
    "A brown horse grazing in a green pasture behind a fence.",
    "People walking along a busy market street with stalls.",
    "A kite flying high in a clear blue sky above the beach.",
    "A bear catching a fish in a rushing river.",
    "A vase of colorful flowers on a kitchen table.",
    "An airplane taking off from a runway at dusk.",
    "A tennis player about to serve on a clay court.",
    "A bedroom with a large bed and wooden furniture.",
    "Sheep grazing on a hillside overlooking the sea.",
    "A man cooking food on an outdoor grill at a picnic.",
    "A traffic light hanging over an intersection at night.",
    "A sandwich cut in half next to a cup of coffee.",
    "A fire hydrant painted red on a city sidewalk.",
    "A group of children playing soccer on a field.",
    "A sailboat drifting on calm water near the shore.",
    "An old truck parked in front of a rustic barn.",
    "A zebra standing in tall grass on the savanna.",
    "A bookshelf filled with books beside a reading chair.",
    "A woman riding a horse along the beach at sunrise.",
    "A microwave sitting on a counter next to an oven.",
    "A bird perched on a branch with cherry blossoms.",
    "A man holding a hot dog at a baseball stadium.",
    "A bunch of bananas hanging at a fruit stand.",
    "A police officer riding a motorcycle in a parade.",
    "A snowboarder jumping off a ramp in midair.",
    "A teddy bear sitting on a child's bed.",
    "A ferry crossing the bay with the city skyline behind.",
    "A chef preparing sushi behind a restaurant counter.",
    "Two cats curled up together on a couch.",
    "A streetcar moving through a downtown district.",
    "A wedding cake with white frosting and roses.",
    "A skateboarder doing a trick on a concrete ledge.",
    "A cow standing in the middle of a country road.",
    "An open refrigerator full of vegetables and drinks.",
    "A lighthouse on a rocky cliff under a cloudy sky.",
    "A man playing a guitar on a street corner.",
    "A bowl of soup with noodles and chopsticks.",
    "A jet flying in formation leaving smoke trails.",
    "A donut with pink icing and sprinkles on a napkin.",
    "A couple holding hands walking under autumn trees.",
    "A parking meter covered in snow on a winter street.",
    "A keyboard and mouse on a desk with two monitors.",
    "A hummingbird hovering near a red flower.",
    "A man fixing the chain on an upside-down bicycle.",
    "A glass of orange juice next to a plate of eggs and toast.",
    "A crowd watching fireworks over the harbor.",
    "A toddler sitting in a high chair eating spaghetti.",
    "A fox walking across a snowy meadow.",
    "An umbrella stand next to a hotel entrance.",
    "A surfer carrying a board walking out of the ocean.",
    "A basket of freshly baked bread on a bakery shelf.",
    "A telephone booth on a rainy london street.",
    "A squirrel eating a nut on a park bench.",
    "A race car speeding around a curve on the track.",
    "A mother duck leading ducklings across a pond.",
    "A barista pouring latte art in a coffee shop.",
    "A castle on a hill surrounded by morning fog.",
    "A man shoveling snow from his driveway.",
    "A colorful hot air balloon floating over farmland.",
    "A plate of tacos with salsa and lime wedges.",
    "A dog sticking its head out of a car window.",
    "A violinist performing in a subway station.",
    "A rowboat tied to a wooden dock on a lake.",
    "A street artist painting a mural on a brick wall.",
    "A bowl of ramen with egg and green onions.",
    "A cyclist riding through a forest trail in autumn.",
    "A penguin standing on an ice floe near the water.",
    "A waiter serving drinks on a restaurant patio.",
    "A camel resting in the desert beside a tent.",
    "A girl jumping rope on a school playground.",
    "A fisherman casting a line from a rocky pier.",
    "A tray of cupcakes decorated with blue frosting.",
]


def get_calib_prompts(dataset: str = "mscoco", n_samples: int = 96,
                      max_chars: int = 200) -> List[str]:
    """Diffusion calibration prompts (calib_data.py:174-213 semantics:
    n short captions, cutoff at 200 chars)."""
    prompts: List[str] = []
    if dataset not in ("builtin", None):
        try:  # local HF datasets cache only (no egress)
            from datasets import load_dataset

            ds = load_dataset("clip-benchmark/wds_mscoco_captions2017",
                              split="test", streaming=False)
            for ex in ds:
                t = ex.get("txt") or ex.get("caption") or ""
                if t:
                    prompts.append(t[:max_chars])
                if len(prompts) >= n_samples:
                    break
        except Exception:
            prompts = []
    if len(prompts) < n_samples:
        base = [p[:max_chars] for p in _BUILTIN_PROMPTS]
        while len(prompts) < n_samples:
            prompts.extend(base)
    return prompts[:n_samples]


def get_calib_dataset(data: str = "pileval", tokenizer=None, n_samples: int = 128,
                      max_seq_len: int = 512, split: str = "validation",
                      text_column: str = "text"):
    """LLM text calibration blocks (calib_data.py:11-69): concat token
    stream, chunk into (n_samples, max_seq_len) blocks."""
    import numpy as np

    texts: List[str] = []
    try:
        from datasets import load_dataset

        if data == "pileval":
            ds = load_dataset("mit-han-lab/pile-val-backup", split="validation")
        else:
            ds = load_dataset(data, split=split)
        for ex in ds:
            t = ex.get(text_column, "")
            if t and t.strip():
                texts.append(t.strip())
            if len(texts) >= n_samples * 4:
                break
    except Exception:
        texts = [p for p in _BUILTIN_PROMPTS] * (n_samples // 8 + 1)

    assert tokenizer is not None, "tokenizer required for LLM calibration"
    ids = []
    for t in texts:
        ids.extend(np.asarray(tokenizer(t[:2000])).reshape(-1).tolist())
        if len(ids) >= n_samples * max_seq_len:
            break
    total = (len(ids) // max_seq_len) * max_seq_len
    arr = np.asarray(ids[:total], np.int32).reshape(-1, max_seq_len)
    return arr[:n_samples]
