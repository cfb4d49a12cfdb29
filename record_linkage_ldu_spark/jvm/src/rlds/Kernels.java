package rlds;

/** String-similarity kernels for the pairwise scorer, JVM-side.
 *
 * RO reproduces Python difflib.SequenceMatcher(None, a, b,
 * autojunk=False).ratio() exactly: recursive longest-matching-block
 * (gestalt pattern matching), tie-broken to the block with smallest
 * end-i then smallest end-j — the same block difflib's ascending scan
 * selects — so scores match the Arrow-UDF fallback bit-for-bit on
 * ASCII inputs (normalized fields are ASCII; non-BMP code points
 * would count as two chars here vs one in Python).
 *
 * JW is the standard Jaro-Winkler (prefix <= 4, p = 0.1, boost
 * threshold 0.7) matching functions/similarity.py.
 */
public final class Kernels {

    private Kernels() {}

    /** total matched chars between a[alo,ahi) and b[blo,bhi). */
    private static int matchTotal(char[] a, int alo, int ahi,
                                  char[] b, int blo, int bhi) {
        int n = ahi - alo, m = bhi - blo;
        if (n <= 0 || m <= 0) {
            return 0;
        }
        // longest common block via DP over end positions; first
        // maximal in (i asc, j asc) scan == difflib's choice
        int besti = alo, bestj = blo, bestsize = 0;
        int[] prev = new int[m + 1];
        int[] cur = new int[m + 1];
        for (int i = alo; i < ahi; i++) {
            char ca = a[i];
            for (int j = blo; j < bhi; j++) {
                int k = (ca == b[j]) ? prev[j - blo] + 1 : 0;
                cur[j - blo + 1] = k;
                if (k > bestsize) {
                    bestsize = k;
                    besti = i - k + 1;
                    bestj = j - k + 1;
                }
            }
            int[] t = prev; prev = cur; cur = t;
        }
        if (bestsize == 0) {
            return 0;
        }
        return bestsize
            + matchTotal(a, alo, besti, b, blo, bestj)
            + matchTotal(a, besti + bestsize, ahi, b, bestj + bestsize, bhi);
    }

    public static double ro(String sa, String sb) {
        if (sa.equals(sb)) {
            return 1.0;
        }
        int la = sa.length(), lb = sb.length();
        if (la == 0 || lb == 0) {
            return 0.0;
        }
        char[] a = sa.toCharArray(), b = sb.toCharArray();
        int m = matchTotal(a, 0, la, b, 0, lb);
        return 2.0 * m / (la + lb);
    }

    public static double jaro(String sa, String sb) {
        if (sa.equals(sb)) {
            return 1.0;
        }
        int la = sa.length(), lb = sb.length();
        if (la == 0 || lb == 0) {
            return 0.0;
        }
        int window = Math.max(la, lb) / 2 - 1;
        if (window < 0) {
            window = 0;
        }
        boolean[] ma = new boolean[la];
        boolean[] mb = new boolean[lb];
        int matches = 0;
        for (int i = 0; i < la; i++) {
            int lo = Math.max(0, i - window);
            int hi = Math.min(lb, i + window + 1);
            for (int j = lo; j < hi; j++) {
                if (!mb[j] && sb.charAt(j) == sa.charAt(i)) {
                    ma[i] = true;
                    mb[j] = true;
                    matches++;
                    break;
                }
            }
        }
        if (matches == 0) {
            return 0.0;
        }
        int transpositions = 0;
        int j = 0;
        for (int i = 0; i < la; i++) {
            if (ma[i]) {
                while (!mb[j]) {
                    j++;
                }
                if (sa.charAt(i) != sb.charAt(j)) {
                    transpositions++;
                }
                j++;
            }
        }
        // integer halving per Winkler's strcmp95 (and DuckDB's
        // builtin) — keeps the JVM kernel bit-equal to the oracle
        double t = transpositions / 2;
        double m = matches;
        return (m / la + m / lb + (m - t) / m) / 3.0;
    }

    public static double jw(String a, String b) {
        double j = jaro(a, b);
        if (j <= 0.7) {
            return j;
        }
        int prefix = 0;
        int max = Math.min(4, Math.min(a.length(), b.length()));
        for (int i = 0; i < max; i++) {
            if (a.charAt(i) != b.charAt(i)) {
                break;
            }
            prefix++;
        }
        return j + prefix * 0.1 * (1.0 - j);
    }

    /** Unrestricted Damerau-Levenshtein (Lowrance &amp; Wagner 1975) —
     * the same algorithm as functions/similarity.py::
     * damerau_levenshtein and DuckDB's damerau_levenshtein, so the
     * column stays hash-checkable whichever engine evaluates it. */
    public static int dl(String sa, String sb) {
        if (sa.equals(sb)) {
            return 0;
        }
        char[] a = sa.toCharArray();
        char[] b = sb.toCharArray();
        int la = a.length, lb = b.length;
        if (la == 0) {
            return lb;
        }
        if (lb == 0) {
            return la;
        }
        int inf = la + lb;
        int[][] h = new int[la + 2][lb + 2];
        for (int[] row : h) {
            java.util.Arrays.fill(row, inf);
        }
        for (int i = 0; i <= la; i++) {
            h[i + 1][1] = i;
        }
        for (int j = 0; j <= lb; j++) {
            h[1][j + 1] = j;
        }
        java.util.HashMap<Character, Integer> lastRow = new java.util.HashMap<>();
        for (int i = 1; i <= la; i++) {
            int lastCol = 0;
            char ca = a[i - 1];
            for (int j = 1; j <= lb; j++) {
                char cb = b[j - 1];
                int i1 = lastRow.getOrDefault(cb, 0);
                int j1 = lastCol;
                int cost;
                if (ca == cb) {
                    cost = 0;
                    lastCol = j;
                } else {
                    cost = 1;
                }
                int best = h[i][j] + cost;                  // sub / match
                best = Math.min(best, h[i + 1][j] + 1);     // insert
                best = Math.min(best, h[i][j + 1] + 1);     // delete
                best = Math.min(best,                       // transpose
                    h[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1));
                h[i + 1][j + 1] = best;
            }
            lastRow.put(ca, i);
        }
        return h[la + 1][lb + 1];
    }

    /** 1 - DL/max(len); both empty -> 1.0 (the
     * lev_normalized_similarity convention). */
    public static double dlNormalized(String a, String b) {
        int m = Math.max(a.length(), b.length());
        if (m == 0) {
            return 1.0;
        }
        return 1.0 - ((double) dl(a, b)) / m;
    }
}
