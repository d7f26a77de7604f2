// Golden-fixture generator for cross-implementation parity testing.
//
// Drives the REFERENCE lexls solver (headers at /root/reference/include,
// used as an external library — nothing is copied into lexls_tpu) on a
// .dat hierarchy corpus and emits one machine-readable JSON record to
// stdout: final x, per-objective constraint violations, active-set
// types, counters, status.  The emitted fixtures are checked into
// tests/golden/ so the Python parity suite runs without Eigen or a C++
// toolchain.
//
// Build/run: see tools/golden/generate.py.

#include <lexls/lexlsi.h>
#include <lexls/tools.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

static void printVector(const char *key, const Eigen::VectorXd &v, bool comma)
{
    std::printf("\"%s\": [", key);
    for (int i = 0; i < v.size(); ++i)
    {
        std::printf("%s%.17e", i ? ", " : "", v[i]);
    }
    std::printf("]%s\n", comma ? "," : "");
}

int main(int argc, char **argv)
{
    if (argc < 2)
    {
        std::fprintf(stderr,
                     "usage: %s file.dat [max_factorizations]"
                     " [--reg type f0,f1,...]\n",
                     argv[0]);
        return 1;
    }

    // optional regularization: --reg <type_int> <comma-joined per-objective
    // factors> (drives parameters.regularization_type +
    // setRegularizationFactor, lexlsi.h:498-503)
    int reg_type = 0;
    std::vector<double> reg_factors;
    for (int a = 2; a < argc; ++a)
    {
        if (std::strcmp(argv[a], "--reg") == 0 && a + 2 < argc)
        {
            reg_type = std::atoi(argv[a + 1]);
            std::string s(argv[a + 2]);
            size_t pos = 0;
            while (pos < s.size())
            {
                size_t next = s.find(',', pos);
                if (next == std::string::npos) next = s.size();
                reg_factors.push_back(std::atof(s.substr(pos, next - pos).c_str()));
                pos = next + 1;
            }
        }
    }

    LexLS::tools::HierarchyType hierarchy_type;
    LexLS::Index nVar;
    LexLS::Index nObj;
    std::vector<LexLS::Index> nCtr;
    std::vector<LexLS::ObjectiveType> objTypes;
    std::vector<Eigen::MatrixXd> objectives;
    std::vector<std::vector<LexLS::ConstraintActivationType>> active_set_guess;
    Eigen::VectorXd solution_guess;
    Eigen::VectorXd solution;

    LexLS::tools::HierarchyFileProcessor fprocessor;
    fprocessor.import(argv[1], hierarchy_type, nVar, nObj, nCtr, objTypes,
                      objectives, active_set_guess, solution_guess, solution);

    if (hierarchy_type == LexLS::tools::HIERARCHY_TYPE_EQUALITY)
    {
        // Equality corpus: one l-QR factorization + basic solve.  (The
        // public facade's solve() does not compile under C++14 — const
        // mismatch at lexls.h:63 — so drive internal::LexLSE directly,
        // which is also what the reference's own tests do.)
        LexLS::internal::LexLSE lse(nVar, nObj, &nCtr[0]);
        lse.setObjDim(&nCtr[0]);
        for (LexLS::Index i = 0; i < nObj; ++i)
        {
            lse.setData(i, objectives[i]);
        }
        lse.factorize();
        lse.solve();
        Eigen::VectorXd x = lse.get_x();

        std::printf("{\n\"kind\": \"equality\",\n");
        printVector("x", x, true);
        std::printf("\"v_norms\": [");
        LexLS::Index row = 0;
        for (LexLS::Index i = 0; i < nObj; ++i)
        {
            Eigen::VectorXd r =
                objectives[i].leftCols(nVar) * x - objectives[i].col(nVar);
            std::printf("%s%.17e", i ? ", " : "", r.norm());
            row += nCtr[i];
        }
        std::printf("]\n}\n");
        return 0;
    }

    LexLS::internal::LexLSI lsi(nVar, nObj, &nCtr[0], &objTypes[0]);
    LexLS::ParametersLexLSI parameters;  // reference defaults
    if (argc > 2 && std::strcmp(argv[2], "--reg") != 0)
    {
        parameters.max_number_of_factorizations = std::atoi(argv[2]);
    }
    if (reg_type != 0)
    {
        parameters.regularization_type =
            static_cast<LexLS::RegularizationType>(reg_type);
    }
    lsi.setParameters(parameters);
    for (size_t i = 0; i < reg_factors.size() && i < (size_t)nObj; ++i)
    {
        lsi.setRegularizationFactor(static_cast<LexLS::Index>(i),
                                    reg_factors[i]);
    }

    for (LexLS::Index i = 0; i < nObj; ++i)
    {
        if (objTypes[i] == LexLS::SIMPLE_BOUNDS_OBJECTIVE)
        {
            // file stores 1-based variable indexes in column 0
            std::vector<LexLS::Index> var_index(nCtr[i]);
            for (LexLS::Index j = 0; j < nCtr[i]; ++j)
            {
                var_index[j] =
                    static_cast<LexLS::Index>(objectives[i](j, 0)) - 1;
            }
            lsi.setData(i, &var_index[0], objectives[i].rightCols(2));
        }
        else
        {
            lsi.setData(i, objectives[i]);
        }
    }

    // warm-start inputs from a HierType-210 file: activation guess via
    // api_activate (LB/UB only — EQ is determined internally, see
    // lexlsi.h:120-136) and x0 via set_x0, mirroring the MEX binding
    // (interfaces/matlab-octave/lexlsi.cpp:554-622).
    if (!active_set_guess.empty())
    {
        for (LexLS::Index i = 0; i < nObj; ++i)
        {
            for (size_t j = 0; j < active_set_guess[i].size(); ++j)
            {
                LexLS::ConstraintActivationType t = active_set_guess[i][j];
                if (t == LexLS::CTR_ACTIVE_LB || t == LexLS::CTR_ACTIVE_UB)
                {
                    lsi.api_activate(i, static_cast<LexLS::Index>(j), t);
                }
            }
        }
    }
    if (solution_guess.size() == nVar)
    {
        lsi.set_x0(solution_guess);
    }

    LexLS::TerminationStatus status = lsi.solve();

    std::printf("{\n\"kind\": \"inequality\",\n");
    std::printf("\"status\": %d,\n", static_cast<int>(status));
    std::printf("\"factorizations\": %d,\n",
                static_cast<int>(lsi.getFactorizationsCount()));
    std::printf("\"activations\": %d,\n",
                static_cast<int>(lsi.getActivationsCount()));
    std::printf("\"deactivations\": %d,\n",
                static_cast<int>(lsi.getDeactivationsCount()));
    printVector("x", lsi.get_x(), true);

    std::printf("\"active\": [");
    for (LexLS::Index i = 0; i < nObj; ++i)
    {
        std::vector<LexLS::ConstraintActivationType> types;
        lsi.getActiveCtr(i, types);
        std::printf("%s[", i ? ", " : "");
        for (size_t j = 0; j < types.size(); ++j)
        {
            std::printf("%s%d", j ? ", " : "", static_cast<int>(types[j]));
        }
        std::printf("]");
    }
    std::printf("],\n");

    std::printf("\"violation\": [");
    for (LexLS::Index i = 0; i < nObj; ++i)
    {
        Eigen::VectorXd w;
        lsi.getConstraintViolation(i, w);
        std::printf("%s[", i ? ", " : "");
        for (int j = 0; j < w.size(); ++j)
        {
            std::printf("%s%.17e", j ? ", " : "", w[j]);
        }
        std::printf("]");
    }
    std::printf("]\n}\n");
    return 0;
}
