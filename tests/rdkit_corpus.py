"""Curated SMILES corpus with known RDKit verdicts.

Reference validity semantics: ``Chem.MolFromSmiles(s) is not None``
(`/root/reference/MoleculeDiffusion/generative.py:954-961`).  Every entry
here is annotated with RDKit's verdict so the no-RDKit valence checker
(``design/valence.py``) can be cross-validated without RDKit in the
environment — and so the moment RDKit appears, ``tests/test_rdkit_gated.py``
re-checks the curation itself against the real library.

  RDKIT_VALID      RDKit parses them (organic subset, charges, radicals,
                   isotopes, aromatics, ring syntax, stereo markers).
  RDKIT_INVALID    RDKit rejects them (grammar, over-valence, kekulization).
  KNOWN_DIVERGENT  (smiles, ours, rdkit) triples where design/valence.py
                   deliberately differs — documented approximations.
"""

RDKIT_VALID = [
    # --- plain organic subset (QM9 chemistry: C/H/N/O/F) ---
    "C", "CC", "CCO", "CCCC", "CC(C)C", "CC(C)(C)C", "C1CC1", "C1CCCCC1",
    "CC(=O)O", "CC(N)C=O", "O=C1CC1", "O=C=O", "C#N", "N#C", "N#CC#N",
    "O=CC=O", "OCC(O)CO", "C1OC1C", "N1CC1", "NC(=O)C1CC1", "CN(C)C=O",
    "CC#CC", "CC=CC", "C=C", "C#C", "CC(C)(O)C#C", "OO", "NN", "FF",
    "FC(F)(F)C", "N1C=CC=C1", "O1C=CC=C1", "C1=CC1", "CC(=O)NC",
    "COC(=O)C", "OC#N", "N=C=O",
    # --- halogens / heavier organic subset ---
    "ClCCl", "BrC(Br)Br", "ClC(Cl)(Cl)Cl", "IC", "ICI",
    "S(=O)(=O)(O)O", "P(O)(O)O", "P(=O)(O)(O)O", "CSC", "CS(=O)C",
    "S(F)(F)(F)(F)(F)F",                  # SF6: S valence 6
    "B(O)(O)O",                           # boronic: B valence 3
    # --- aromatics (kekulizable) ---
    "c1ccccc1", "c1ccc2ccccc2c1", "c1cc[nH]c1", "c1ccncc1", "c1ccoc1",
    "c1ccsc1", "Cc1ccccc1", "c1ccc(cc1)O", "O=c1cc[nH]c(=O)[nH]1",
    "c1cnc2[nH]ccc2c1", "n1ccccc1", "c1ccc(-c2ccccc2)cc1",
    "c1ccc(cc1)N", "Nc1ccncc1", "c1cscn1",          # thiazole
    "c1cnc[nH]1",                                   # imidazole
    # --- kekulé spellings + real molecules ---
    "C1=CC=CC=C1", "CN1C=NC2=C1C(=O)N(C(=O)N2C)C",  # benzene, caffeine
    "CC(=O)Oc1ccccc1C(=O)O",                        # aspirin
    "OC(=O)c1ccccc1",                               # benzoic acid
    # --- brackets: charges, explicit H, isotopes, radicals, chirality ---
    "[NH4+]", "[O-]C(=O)C", "CC[N+](C)(C)C", "[13C]", "[C]", "[CH2]",
    "C[C@H](N)C(=O)O", "[OH3+]", "[CH3+]", "[NH3+]CC([O-])=O",
    "C[N+](=O)[O-]",                                # nitromethane (charged)
    "[2H]C([2H])([2H])O",                           # d3-methanol
    "[B-](F)(F)(F)F",                               # tetrafluoroborate
    "[N-]=[N+]=N",                                  # azide (HN3)
    "[C-]#[O+]",                                    # carbon monoxide
    # --- ring syntax: closure bonds, %nn, reuse, spiro ---
    "C=1CC1", "C=1CC=1", "C=2CC2C", "C%10CC%10", "C1CC1C1CC1",
    "C1CC12CC2",                                    # spiropentane
    # --- fragments & stereo bonds ---
    "CC.OC", "C/C=C/C", "F/C=C/F", "F/C=C\\F",
]

RDKIT_INVALID = [
    # --- grammar ---
    "", "1CC", "C((C", "C)C", "C1CC", "CC=", "((", "=C", "11", "C1CC2",
    "C..C", "C=.C", ".C", "C.", "Xx", "[Zz]", "C%1", "c1ccc cc1", "C11",
    "C%2CC2", "C[", "C]", "[]", "[-]", "C==C", "C#=C",
    # --- valence violations RDKit rejects that grammar alone cannot catch ---
    "C(C)(C)(C)(C)C",      # pentavalent carbon
    "F=F",                 # divalent fluorine
    "O=O=O",               # tetravalent oxygen
    "N(C)(C)(C)C",         # tetravalent neutral nitrogen
    "F(C)C",               # divalent fluorine again
    "O#C",                 # triple-bonded O (valence 3)
    "CC(=O)=O",            # carbon with 2 doubles + 2 singles = 6
    "CN(=O)=O",            # neutral pentavalent N (nitro must be charged)
    "O(C)(C)C",            # trivalent neutral oxygen
    "I(C)C",               # divalent neutral iodine
    "S(F)(F)(F)(F)(F)(F)F",  # SF7
    "[CH5]", "[NH4]",      # bracket over-valence (no charge)
    "[CH4+]",              # C+ max valence 3
    "[F-]C",               # F- cannot bond
    "Cl=C",                # divalent chlorine
    # --- kekulization / aromatic-placement failures ---
    "cc", "cC", "c1cc1C",  # aromatic atoms outside a proper ring / odd ring
    "c1ccnc1",             # 5-ring pyridine-type n: un-kekulizable
    "c1ccccc1c",           # dangling aromatic atom off the ring
    "c1ccc2cc1",           # 'naphthalene' missing an atom: bad fusion
    # --- Hückel 4n+2 failures (matching exists; aromaticity impossible) ---
    "c1ccc1",              # cyclobutadiene (4 pi)
    "c1ccccccc1",          # cyclooctatetraene written aromatic (8 pi)
    "c1cccc1",             # cyclopentadiene written aromatic (5 pi)
    "c1ccccc1cc1ccccc1",   # aromatic bond bridging two rings (cc not in
                           # any ring — RDKit: non-ring aromatic bond)
    "c1cc[nH2+]cc1",       # nH2+ needs a pi bond -> pentavalent N+
]

# --- entries the valence checker once diverged on (KNOWN_DIVERGENT until
# round 4's Hückel + metal-valence upgrade) now live in the main lists:
RDKIT_VALID += [
    "[Na+]", "[Fe+2]", "[Na+].[Cl-]",    # bare metal ions (valence -1)
    "Cl[Fe]Cl",                          # bonded metal, unchecked valence
    # charged aromatics the Hückel/pyridinium upgrade unlocked
    "c1cc[nH+]cc1",                      # pyridinium
    "C[n+]1ccccc1",                      # N-methylpyridinium
    "[O-][n+]1ccccc1",                   # pyridine N-oxide
    "[cH+]1cccccc1",                     # tropylium (6 pi, C+ gives 0)
    "[cH-]1cccc1",                       # cyclopentadienyl anion (6 pi)
    "c1ccc2cccc2cc1",                    # azulene: 10-pi perimeter wins
]

# --- round-5 advisor findings: main-group bracket valences + charged
# aromatic O/S (pyrylium-type) + 4n-annulenes above the old size guard ---
RDKIT_VALID += [
    "[o+]1ccccc1",                       # pyrylium: o+ donates 1 pi
    "[s+]1ccccc1",                       # thiopyrylium
    "C[Si](C)(C)C", "[SiH4]",            # Si default valence 4
    "[AlH4-]", "[Mg+2]", "[K+]",         # early-atom charge flip
    "[SeH2]", "C[Se]C",                  # Se (2,4,6)
    "O=[As](O)(O)O",                     # arsenate: As valence 5
]
RDKIT_INVALID += [
    "[SiH8]", "[MgH6]", "C[Na](C)C",     # main-group over-valence (RDKit
                                         # checks these; only transition
                                         # metals/lanthanides are -1)
    "[NaH2]", "[AlH6]",                  # more early-atom over-valence
    "c1" + "c" * 26 + "c1",              # [28]annulene: 4n pi, rejected
                                         # beyond the retired 24-atom guard
]

# (smiles, ours, rdkit): deliberate approximations of design/valence.py,
# each with the reason pinned in tests/test_valence.py.  Empty since the
# round-4 Hückel 4n+2 + metal-valence upgrade closed all five documented
# divergences; kept so tests/test_rdkit_gated.py's machinery stays wired
# for any future, deliberately-accepted divergence.
KNOWN_DIVERGENT = []
