/* Parity driver: runs the UNMODIFIED reference pairwise engine
 * (/root/reference/impl/{pairwiseAligner,stateMachine}.c) against
 * sequences piped in by tests/test_ref_parity.py, printing posterior
 * pairs / forward prob / EM expectations for comparison with the
 * cpecan_tpu engines.
 *
 * stdin: line 1 = seqX, line 2 = seqY,
 *        line 3 (optional) = anchors "x,y,expansion x,y,expansion ..."
 * argv:  parity_main MODE SMTYPE [threshold] [raggedLeft] [raggedRight] [hmmFile]
 *        MODE   = pairs | indels | forward | expectations
 *        SMTYPE = fiveState | fiveStateAsymmetric | threeState
 *                 | threeStateAsymmetric
 * stdout: pairs:  "x y prob" per line (prob = fixed-point/1e7)
 *         indels: same, prefixed with "M ", "X ", "Y "
 *         forward: one float (log prob)
 *         expectations: reference hmm_write text format
 */
#include "sonLib.h"
#include "pairwiseAligner.h"
#include "multipleAligner.h"

static char *read_line(void) {
    char *line = stFile_getLineFromFile(stdin);
    if (line == NULL) {
        st_errAbort("parity_main: missing input line");
    }
    return line;
}

static stList *parse_anchors(const char *line) {
    stList *anchors = stList_construct3(0, (void (*)(void *))stIntTuple_destruct);
    const char *p = line;
    while (*p) {
        while (*p == ' ') {
            p++;
        }
        if (!*p) {
            break;
        }
        long long x, y, e;
        int consumed = 0;
        if (sscanf(p, "%lld,%lld,%lld%n", &x, &y, &e, &consumed) != 3) {
            st_errAbort("parity_main: bad anchor token at '%s'", p);
        }
        stList_append(anchors, stIntTuple_construct3(x, y, e));
        p += consumed;
    }
    return anchors;
}

static void print_pairs(stList *pairs, const char *prefix) {
    for (int64_t i = 0; i < stList_length(pairs); i++) {
        stIntTuple *t = stList_get(pairs, i);
        printf("%s%" PRIi64 " %" PRIi64 " %.9f\n", prefix,
               stIntTuple_get(t, 1), stIntTuple_get(t, 2),
               (double)stIntTuple_get(t, 0) / PAIR_ALIGNMENT_PROB_1);
    }
}

/* poset_filter MODE: stdin = seqX, seqY, then one "score x y" line per
 * aligned pair (score fixed-point PAIR_ALIGNMENT_PROB_1).  Runs the
 * reference reweightAlignedPairs2 + filterPairwiseAlignmentToMakePairsOrdered
 * (cPecanRealign.c:552-553) and prints surviving pairs.  Run with
 * PARITY_ZERO_RANDOM=1 so the weight jitter is deterministic. */
static void run_poset_filter(double gapGamma, double matchGamma) {
    char *seqX = stFile_getLineFromFile(stdin);
    char *seqY = stFile_getLineFromFile(stdin);
    if (seqX == NULL || seqY == NULL) {
        st_errAbort("poset_filter: missing sequence lines");
    }
    stList *alignedPairs =
        stList_construct3(0, (void (*)(void *))stIntTuple_destruct);
    char *line;
    while ((line = stFile_getLineFromFile(stdin)) != NULL) {
        long long score, x, y;
        if (sscanf(line, "%lld %lld %lld", &score, &x, &y) != 3) {
            st_errAbort("poset_filter: bad pair line '%s'", line);
        }
        stList_append(alignedPairs, stIntTuple_construct3(score, x, y));
        free(line);
    }
    alignedPairs = reweightAlignedPairs2(alignedPairs, strlen(seqX),
                                         strlen(seqY), gapGamma);
    alignedPairs = filterPairwiseAlignmentToMakePairsOrdered(
        alignedPairs, seqX, seqY, matchGamma);
    print_pairs(alignedPairs, "");
    stList_destruct(alignedPairs);
    free(seqX);
    free(seqY);
}

/* msa MODE: stdin = N, then N lines "leftEndId rightEndId sequence".
 * Runs the reference makeAlignment (multipleAligner.c:887) and prints
 * each column as sorted "seq,pos" members, plus the filtered
 * consistent pairs and chosen pairwise alignments. */
static int cmp_columns_member(const void *a, const void *b) {
    return stIntTuple_cmpFn((stIntTuple *)a, (stIntTuple *)b);
}

static void print_columns(stSet *columns) {
    stList *columnLines = stList_construct3(0, free);
    stSetIterator *it = stSet_getIterator(columns);
    Column *c;
    while ((c = stSet_getNext(it)) != NULL) {
        stList *members =
            stList_construct3(0, (void (*)(void *))stIntTuple_destruct);
        for (Column *m = c; m != NULL; m = m->nColumn) {
            stList_append(members,
                          stIntTuple_construct2(m->seqName, m->position));
        }
        stList_sort(members, cmp_columns_member);
        char buf[1 << 16];
        size_t off = 0;
        for (int64_t i = 0; i < stList_length(members); i++) {
            stIntTuple *t = stList_get(members, i);
            off += (size_t)snprintf(buf + off, sizeof(buf) - off,
                                    "%s%" PRIi64 ",%" PRIi64,
                                    i == 0 ? "" : " ", stIntTuple_get(t, 0),
                                    stIntTuple_get(t, 1));
        }
        stList_append(columnLines, stString_copy(buf));
        stList_destruct(members);
    }
    stSet_destructIterator(it);
    stList_sort(columnLines, (int (*)(const void *, const void *))strcmp);
    printf("columns %" PRIi64 "\n", stList_length(columnLines));
    for (int64_t i = 0; i < stList_length(columnLines); i++) {
        printf("%s\n", (char *)stList_get(columnLines, i));
    }
    stList_destruct(columnLines);
}

/* msa_merge MODE: isolates the column-merge layer from the pairwise
 * engine.  stdin: N, then N lines "leftEndId rightEndId sequence", then
 * one line "score seq1 pos1 seq2 pos2" per multiple-aligned pair, then
 * (progressive only) similarity lines "score seqX seqY".  Runs
 * getMultipleSequenceAlignment[Progressive] + filterMultipleAlignedPairs
 * on EXACTLY these pairs and prints the partition + surviving pairs. */
static void run_msa_merge(int progressive, double matchGamma) {
    char *nLine = stFile_getLineFromFile(stdin);
    if (nLine == NULL) {
        st_errAbort("msa_merge: missing seq count");
    }
    int64_t n = atoll(nLine);
    free(nLine);
    stList *seqFrags = stList_construct3(0, (void (*)(void *))seqFrag_destruct);
    for (int64_t i = 0; i < n; i++) {
        char *line = stFile_getLineFromFile(stdin);
        if (line == NULL) {
            st_errAbort("msa_merge: missing seq line %" PRIi64, i);
        }
        long long leftEnd, rightEnd;
        int consumed = 0;
        if (sscanf(line, "%lld %lld %n", &leftEnd, &rightEnd, &consumed) != 2) {
            st_errAbort("msa_merge: bad seq line '%s'", line);
        }
        stList_append(seqFrags,
                      seqFrag_construct(line + consumed, leftEnd, rightEnd));
        free(line);
    }
    char *mLine = stFile_getLineFromFile(stdin);
    int64_t m = mLine == NULL ? 0 : atoll(mLine);
    free(mLine);
    stList *pairs = stList_construct3(0, (void (*)(void *))stIntTuple_destruct);
    for (int64_t i = 0; i < m; i++) {
        char *line = stFile_getLineFromFile(stdin);
        long long sc, s1, p1, s2, p2;
        if (line == NULL
            || sscanf(line, "%lld %lld %lld %lld %lld", &sc, &s1, &p1, &s2,
                      &p2) != 5) {
            st_errAbort("msa_merge: bad pair line");
        }
        stList_append(pairs, stIntTuple_construct5(sc, s1, p1, s2, p2));
        free(line);
    }
    stSet *columns;
    if (progressive) {
        stList *sims =
            stList_construct3(0, (void (*)(void *))stIntTuple_destruct);
        char *line;
        while ((line = stFile_getLineFromFile(stdin)) != NULL) {
            long long sc, sx, sy;
            if (sscanf(line, "%lld %lld %lld", &sc, &sx, &sy) != 3) {
                st_errAbort("msa_merge: bad similarity line '%s'", line);
            }
            stList_append(sims, stIntTuple_construct3(sc, sx, sy));
            free(line);
        }
        columns = getMultipleSequenceAlignmentProgressive(seqFrags, pairs,
                                                          matchGamma, sims);
        stList_destruct(sims);
    } else {
        columns = getMultipleSequenceAlignment(seqFrags, pairs, matchGamma);
    }
    print_columns(columns);
    pairs = filterMultipleAlignedPairs(columns, pairs);
    printf("pairs %" PRIi64 "\n", stList_length(pairs));
    for (int64_t i = 0; i < stList_length(pairs); i++) {
        stIntTuple *t = stList_get(pairs, i);
        printf("%" PRIi64 " %" PRIi64 " %" PRIi64 " %" PRIi64 " %" PRIi64 "\n",
               stIntTuple_get(t, 0), stIntTuple_get(t, 1),
               stIntTuple_get(t, 2), stIntTuple_get(t, 3),
               stIntTuple_get(t, 4));
    }
    stList_destruct(pairs);
    stSet_destruct(columns);
    stList_destruct(seqFrags);
}

static void run_msa(StateMachine *sM, PairwiseAlignmentParameters *p,
                    long long spanningTrees, long long maxPairsToConsider,
                    int useProgressive, double matchGamma) {
    char *nLine = stFile_getLineFromFile(stdin);
    if (nLine == NULL) {
        st_errAbort("msa: missing seq count");
    }
    int64_t n = atoll(nLine);
    free(nLine);
    stList *seqFrags = stList_construct3(0, (void (*)(void *))seqFrag_destruct);
    for (int64_t i = 0; i < n; i++) {
        char *line = stFile_getLineFromFile(stdin);
        if (line == NULL) {
            st_errAbort("msa: missing seq line %" PRIi64, i);
        }
        long long leftEnd, rightEnd;
        int consumed = 0;
        if (sscanf(line, "%lld %lld %n", &leftEnd, &rightEnd, &consumed) != 2) {
            st_errAbort("msa: bad seq line '%s'", line);
        }
        stList_append(seqFrags,
                      seqFrag_construct(line + consumed, leftEnd, rightEnd));
        free(line);
    }
    MultipleAlignment *mA = makeAlignment(sM, seqFrags, spanningTrees,
                                          maxPairsToConsider, useProgressive,
                                          matchGamma, p);
    /* Canonical output: members sorted within a column, columns sorted. */
    print_columns(mA->columns);
    printf("pairs %" PRIi64 "\n", stList_length(mA->alignedPairs));
    for (int64_t i = 0; i < stList_length(mA->alignedPairs); i++) {
        stIntTuple *t = stList_get(mA->alignedPairs, i);
        printf("%" PRIi64 " %" PRIi64 " %" PRIi64 " %" PRIi64 " %.9f\n",
               stIntTuple_get(t, 1), stIntTuple_get(t, 2),
               stIntTuple_get(t, 3), stIntTuple_get(t, 4),
               (double)stIntTuple_get(t, 0) / PAIR_ALIGNMENT_PROB_1);
    }
    printf("chosen %" PRIi64 "\n", stList_length(mA->chosenPairwiseAlignments));
    for (int64_t i = 0; i < stList_length(mA->chosenPairwiseAlignments); i++) {
        stIntTuple *t = stList_get(mA->chosenPairwiseAlignments, i);
        printf("%" PRIi64 " %" PRIi64 " %.9f\n", stIntTuple_get(t, 1),
               stIntTuple_get(t, 2),
               (double)stIntTuple_get(t, 0) / PAIR_ALIGNMENT_PROB_1);
    }
    multipleAlignment_destruct(mA);
    stList_destruct(seqFrags);
}

int main(int argc, char **argv) {
    if (argc < 3) {
        st_errAbort("usage: parity_main MODE SMTYPE [threshold] [raggedL] [raggedR] [hmmFile]");
    }
    const char *mode = argv[1];
    if (strcmp(mode, "poset_filter") == 0) {
        /* parity_main poset_filter gapGamma matchGamma */
        if (argc < 4) {
            st_errAbort("usage: parity_main poset_filter gapGamma matchGamma");
        }
        run_poset_filter(atof(argv[2]), atof(argv[3]));
        return 0;
    }
    if (strcmp(mode, "msa_merge") == 0) {
        /* parity_main msa_merge greedy|progressive matchGamma */
        if (argc < 4) {
            st_errAbort(
                "usage: parity_main msa_merge greedy|progressive matchGamma");
        }
        run_msa_merge(strcmp(argv[2], "progressive") == 0, atof(argv[3]));
        return 0;
    }
    const char *smName = argv[2];
    double threshold = argc > 3 ? atof(argv[3]) : 0.01;
    bool raggedLeft = argc > 4 ? atoi(argv[4]) != 0 : 0;
    bool raggedRight = argc > 5 ? atoi(argv[5]) != 0 : 0;
    const char *hmmFile = (argc > 6 && argv[6][0] != '-') ? argv[6] : NULL;
    /* optional banding overrides (mirror the library-struct fields the
     * CLIs override): argv[7] = diagonalExpansion,
     * argv[8] = splitMatrixBiggerThanThis */
    long long diagExpansion = argc > 7 ? atoll(argv[7]) : -1;
    long long splitMatrix = argc > 8 ? atoll(argv[8]) : -1;

    StateMachineType type;
    if (strcmp(smName, "fiveState") == 0) {
        type = fiveState;
    } else if (strcmp(smName, "fiveStateAsymmetric") == 0) {
        type = fiveStateAsymmetric;
    } else if (strcmp(smName, "threeState") == 0) {
        type = threeState;
    } else if (strcmp(smName, "threeStateAsymmetric") == 0) {
        type = threeStateAsymmetric;
    } else {
        st_errAbort("parity_main: unknown state machine type %s", smName);
    }

    StateMachine *sM;
    if (hmmFile != NULL) {
        Hmm *hmm = hmm_loadFromFile(hmmFile);
        sM = hmm_getStateMachine(hmm);
        hmm_destruct(hmm);
    } else if (type == threeState || type == threeStateAsymmetric) {
        sM = stateMachine3_construct(type);
    } else {
        sM = stateMachine5_construct(type);
    }

    PairwiseAlignmentParameters *p = pairwiseAlignmentBandingParameters_construct();
    p->threshold = threshold;
    if (diagExpansion >= 0) {
        p->diagonalExpansion = diagExpansion;
    }
    if (splitMatrix >= 0) {
        p->splitMatrixBiggerThanThis = splitMatrix;
    }

    if (strcmp(mode, "em_corpus") == 0) {
        /* E-step over a whole corpus accumulated into ONE Hmm, exactly
         * as one cPecanRealign --outputExpectations process does over
         * its chunk (cPecanRealign.c:492-534,608-614).  stdin: K, then
         * K groups of (seqX, seqY, anchorLine).  Prints hmm_write. */
        char *kLine = read_line();
        int64_t k = atoll(kLine);
        free(kLine);
        Hmm *hmm = hmm_constructEmpty(0.000000000001, type);
        for (int64_t i = 0; i < k; i++) {
            char *sx = read_line();
            char *sy = read_line();
            char *aLine = stFile_getLineFromFile(stdin);
            stList *anchors = parse_anchors(aLine == NULL ? "" : aLine);
            free(aLine);
            getExpectationsUsingAnchors(sM, hmm, sx, sy, anchors, p,
                                        raggedLeft, raggedRight);
            stList_destruct(anchors);
            free(sx);
            free(sy);
        }
        hmm_write(hmm, stdout);
        hmm_destruct(hmm);
        pairwiseAlignmentBandingParameters_destruct(p);
        stateMachine_destruct(sM);
        return 0;
    }
    if (strcmp(mode, "msa") == 0) {
        /* parity_main msa SMTYPE threshold raggedL raggedR hmmFile
         *   diagExpansion splitMatrix spanningTrees maxPairs
         *   useProgressive matchGamma
         * (positions 3..8 reuse the pairwise-mode slots; "-" skips) */
        long long spanningTrees = argc > 9 ? atoll(argv[9]) : 2;
        long long maxPairs = argc > 10 ? atoll(argv[10]) : 10000;
        int useProgressive = argc > 11 ? atoi(argv[11]) : 0;
        double matchGamma = argc > 12 ? atof(argv[12]) : 0.0;
        run_msa(sM, p, spanningTrees, maxPairs, useProgressive, matchGamma);
        pairwiseAlignmentBandingParameters_destruct(p);
        stateMachine_destruct(sM);
        return 0;
    }

    char *seqX = read_line();
    char *seqY = read_line();
    char *anchorLine = stFile_getLineFromFile(stdin);
    stList *anchors = parse_anchors(anchorLine == NULL ? "" : anchorLine);
    free(anchorLine);

    if (strcmp(mode, "pairs") == 0) {
        stList *pairs = getAlignedPairsUsingAnchors(sM, seqX, seqY, anchors, p,
                                                    raggedLeft, raggedRight);
        print_pairs(pairs, "");
        stList_destruct(pairs);
    } else if (strcmp(mode, "indels") == 0) {
        stList *pairs = NULL, *gapX = NULL, *gapY = NULL;
        getAlignedPairsWithIndelsUsingAnchors(sM, seqX, seqY, anchors, p,
                                              &pairs, &gapX, &gapY,
                                              raggedLeft, raggedRight);
        print_pairs(pairs, "M ");
        print_pairs(gapX, "X ");
        print_pairs(gapY, "Y ");
        stList_destruct(pairs);
        stList_destruct(gapX);
        stList_destruct(gapY);
    } else if (strcmp(mode, "mea") == 0) {
        double score = 0.0;
        stList *pairs = getShiftedMEAAlignment(seqX, seqY, anchors, p, sM,
                                               raggedLeft, raggedRight,
                                               &score);
        printf("score %.9f\n", score);
        print_pairs(pairs, "");
        stList_destruct(pairs);
    } else if (strcmp(mode, "forward") == 0) {
        double f = computeForwardProbability(seqX, seqY, anchors, p, sM,
                                             raggedLeft, raggedRight);
        printf("%.9f\n", f);
    } else if (strcmp(mode, "expectations") == 0) {
        Hmm *hmm = hmm_constructEmpty(0.000000000001, type);
        getExpectationsUsingAnchors(sM, hmm, seqX, seqY, anchors, p,
                                    raggedLeft, raggedRight);
        hmm_write(hmm, stdout);
        hmm_destruct(hmm);
    } else {
        st_errAbort("parity_main: unknown mode %s", mode);
    }

    stList_destruct(anchors);
    free(seqX);
    free(seqY);
    pairwiseAlignmentBandingParameters_destruct(p);
    stateMachine_destruct(sM);
    return 0;
}
