"""GPT-4 one-shot prompt builder for *refining* MusicCaps captions into
concise music-generation prompts.

Capability parity with the paper sample code (reference
example/prompts/gpt4_refine.py). Not part of the FAD pipeline.
"""


def create_prompt(caption: str) -> str:
    return (
        "Rewrite the following music description as a short, vivid prompt "
        "suitable for a text-to-music generation model. Keep genre, mood, "
        "instrumentation and tempo; drop non-musical details.\n\n"
        f"Description: {caption}\n"
        "Prompt:"
    )
