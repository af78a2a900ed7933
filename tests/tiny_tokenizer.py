"""Char-level tokenizer matched to Qwen25VLConfig.tiny_test token ids, for
end-to-end pipeline tests without real tokenizer files."""


class TinyTokenizer:
    chat_template = None
    SPECIALS = {
        "<|vision_start|>": 250,
        "<|vision_end|>": 251,
        "<|image_pad|>": 252,
        "<|video_pad|>": 253,
        "<|im_start|>": 2,
        "<|im_end|>": 1,  # tiny cfg eos_token_id
    }

    def __init__(self):
        self._rev = {v: k for k, v in self.SPECIALS.items()}

    def encode(self, s, add_special_tokens=False):
        out = []
        i = 0
        while i < len(s):
            for tok, tid in self.SPECIALS.items():
                if s.startswith(tok, i):
                    out.append(tid)
                    i += len(tok)
                    break
            else:
                c = ord(s[i])
                # printable ASCII maps invertibly to ids [3, 97]; everything
                # else lands on id 98 ('?')
                out.append(c - 32 + 3 if 32 <= c < 127 else 98)
                i += 1
        return out

    def decode(self, ids, skip_special_tokens=False):
        parts = []
        for t in ids:
            t = int(t)
            if t in self._rev:
                if not skip_special_tokens:
                    parts.append(self._rev[t])
            elif 3 <= t <= 97:
                parts.append(chr(t - 3 + 32))
            elif 98 <= t < 250:
                parts.append("?")
            # ids 0 (pad) and others: dropped
        return "".join(parts)
