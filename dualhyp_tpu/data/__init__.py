from dualhyp_tpu.data.prompts import PROMPT_FORMATS, get_prompts_format

__all__ = ["PROMPT_FORMATS", "get_prompts_format"]
