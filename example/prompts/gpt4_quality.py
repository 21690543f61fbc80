"""GPT-4 one-shot prompt builder for music *quality* labeling.

Capability parity with the paper sample code (reference
example/prompts/gpt4_quality.py): builds a prompt asking GPT-4 to rate the
musical quality described by a MusicCaps aspect list. Not part of the FAD
pipeline (SURVEY.md §2 #13).
"""


def create_prompt(aspects: str) -> str:
    return (
        "You are assisting a study of music generation quality. Given the "
        "following aspect list describing a music clip, rate the clip's "
        "musical quality on a scale from 1 (very poor) to 5 (excellent), and "
        "answer with only the number.\n\n"
        f"Aspect list: {aspects}\n"
        "Quality rating:"
    )
