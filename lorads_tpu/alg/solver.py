LoradsSolver = None

def solve(*a, **k):
    raise NotImplementedError
